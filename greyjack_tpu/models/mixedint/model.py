"""Mixed-integer / continuous benchmark model (LSHADE's home turf).

The reference supports continuous, integer and MIP problems (`README.md:21`)
and recommends LSHADE for them (`agents/lshade.rs` header comment). This
model family provides classic benchmark objectives (rastrigin, rosenbrock,
sphere) over an arbitrary mix of float and integer variables, as the
BASELINE "mixed-integer continuous benchmark (GA on float+int chromosomes,
pure-kernel scoring)" config.
"""

from __future__ import annotations

import copy

import jax.numpy as jnp

from greyjack_tpu.cotwin import Cotwin, CotwinBuilderBase
from greyjack_tpu.variables import GJFloat, GJInteger
from greyjack_tpu.score_calculation.scores import SimpleScore
from greyjack_tpu.score_calculation.score_calculators import PlainScoreCalculator


class MixedIntDomain:
    def __init__(self, n_floats, n_ints, lower=-5.12, upper=5.12,
                 objective="rastrigin"):
        self.n_floats = int(n_floats)
        self.n_ints = int(n_ints)
        self.lower = float(lower)
        self.upper = float(upper)
        self.objective = objective
        self.solution_values = None


class DomainBuilder:
    def __init__(self, n_floats, n_ints, lower=-5.12, upper=5.12,
                 objective="rastrigin"):
        self._args = (n_floats, n_ints, lower, upper, objective)

    def build_domain_from_scratch(self):
        return MixedIntDomain(*self._args)

    def build_from_solution(self, solution, initial_domain=None):
        domain = self.build_domain_from_scratch()
        domain.solution_values = [value for _name, value in solution[0]]
        return domain

    def build_from_domain(self, domain):
        return copy.deepcopy(domain)


class CotVariable:
    def __init__(self, var):
        self.value = var

    def to_vec(self):
        return [("value", self.value)]


def _objective_fn(name):
    if name == "rastrigin":
        def f(x):
            return 10.0 * x.shape[0] + jnp.sum(
                x * x - 10.0 * jnp.cos(2.0 * jnp.pi * x)
            )
    elif name == "rosenbrock":
        def f(x):
            return jnp.sum(
                100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
            )
    elif name == "sphere":
        def f(x):
            return jnp.sum(x * x)
    else:
        raise ValueError(f"unknown objective {name}")
    return f


class CotwinBuilder(CotwinBuilderBase):
    def build_cotwin(self, domain, is_already_initialized):
        entities = []
        for _ in range(domain.n_floats):
            entities.append(CotVariable(
                GJFloat(None, domain.lower, domain.upper, False, None)))
        for _ in range(domain.n_ints):
            entities.append(CotVariable(
                GJInteger(None, int(domain.lower), int(domain.upper), False,
                          None)))

        obj = _objective_fn(domain.objective)

        def objective_constraint(planning, facts, utils):
            x = planning["variables"]["value"]
            return (obj(jnp.asarray(x, jnp.float64)),)

        cotwin = Cotwin()
        cotwin.add_planning_entities("variables", entities)
        calculator = PlainScoreCalculator(SimpleScore)
        calculator.add_constraint("objective", objective_constraint)
        cotwin.add_score_calculator(calculator)
        return cotwin
