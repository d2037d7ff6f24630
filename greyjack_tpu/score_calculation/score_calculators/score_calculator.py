"""Constraint registries.

Reference: `greyjack/src/score_calculation/score_calculators/
plain_score_calculator.rs:8-99` — named constraint closures over
(planning dfs, fact dfs, utility objects) returning one score per sample,
plus prescoring functions (shared precomputation) and per-constraint
weights applied as a sequential weighted sum.

TPU redesign: a constraint is a pure JAX function over ONE candidate's typed
entity arrays; the framework vmaps the composed calculator over the whole
population, so every Polars group_by/join in the reference becomes a batched
gather/segment kernel here (see `greyjack_tpu.ops`). Dataframes never exist
on the hot path.

Constraint signature:
    fn(planning: {group: {col: array[n_entities]}},
       facts:    {group: {col: array[n_rows]}},
       utils:    dict) -> score components (tuple of scalars or f64[S])

Prescoring signature: same inputs -> dict merged into `utils` for the
constraints of this calculator (reference `plain_score_calculator.rs:52-58`).
"""

from __future__ import annotations

import jax.numpy as jnp


class PlainScoreCalculator:
    is_incremental = False

    def __init__(self, score_class):
        self.score_class = score_class
        self.score_size = score_class.precision_len()
        self.constraints: dict = {}
        self.constraint_weights: dict = {}
        self.prescoring_functions: dict = {}
        self.utility_objects: dict = {}

    # --- registry (reference API surface) ---------------------------------
    def add_constraint(self, name, fn, weight: float = 1.0):
        self.constraints[name] = fn
        self.constraint_weights[name] = float(weight)

    def remove_constraint(self, name):
        self.constraints.pop(name, None)
        self.constraint_weights.pop(name, None)

    def set_constraint_weights(self, weights: dict):
        for name, w in weights.items():
            self.constraint_weights[name] = float(w)

    def add_prescoring_function(self, name, fn):
        self.prescoring_functions[name] = fn

    def add_utility_object(self, name, obj):
        self.utility_objects[name] = obj

    # --- evaluation ---------------------------------------------------------
    def score_one(self, planning, facts):
        """Score a single candidate's frames -> f64[S].

        Vmapped over the population by `ScoreRequester`; weighted constraint
        results are folded in insertion order (fp-parity with the
        reference's sequential `add_assign`, `plain_score_calculator.rs:79-90`).
        """
        utils = dict(self.utility_objects)
        for fn in self.prescoring_functions.values():
            extra = fn(planning, facts, utils)
            if extra:
                utils.update(extra)

        total = jnp.zeros((self.score_size,), dtype=jnp.float64)
        for name, fn in self.constraints.items():
            row = fn(planning, facts, utils)
            if isinstance(row, (tuple, list)):
                row = jnp.stack([jnp.asarray(r, dtype=jnp.float64) for r in row])
            else:
                row = jnp.asarray(row, dtype=jnp.float64).reshape(self.score_size)
            w = self.constraint_weights[name]
            total = total + (row if w == 1.0 else w * row)
        return total


class IncrementalScoreCalculator(PlainScoreCalculator):
    """API-parity alias for the reference's delta-df calculator
    (`incremental_score_calculator.rs:8-104`).

    On TPU the batched plain path IS the fast path: the reference's delta
    machinery exists only to dodge per-step dataframe rebuild costs
    (`oop_score_requester.rs:384-441`), which have no analog here — every
    candidate is re-scored by fused kernels at full population width. The
    class exists so cotwin builders written against the reference API port
    1:1; constraints use the plain signature.
    """

    is_incremental = True
