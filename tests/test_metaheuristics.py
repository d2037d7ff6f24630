"""Per-metaheuristic smoke + behavior tests: LateAcceptance, SimulatedAnnealing,
LSHADE, GeneticAlgorithm all make progress on their home workloads."""

import numpy as np

from greyjack_tpu.models.nqueens import DomainBuilder as NQDomain
from greyjack_tpu.models.nqueens import CotwinBuilder as NQCotwin
from greyjack_tpu.models.mixedint import DomainBuilder as MIDomain
from greyjack_tpu.models.mixedint import CotwinBuilder as MICotwin
from greyjack_tpu.agents import (
    LateAcceptance,
    SimulatedAnnealing,
    LSHADE,
    GeneticAlgorithm,
)
from greyjack_tpu.agents.termination_strategies import StepsLimit, ScoreLimit
from greyjack_tpu.score_calculation.scores import SimpleScore
from greyjack_tpu.solver import Solver, SolverLoggingLevels

SWAP_ONLY = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0]


def _initial_conflicts(n=12, seed=45):
    return NQDomain(n, seed).build_domain_from_scratch().conflict_count()


def test_late_acceptance_improves():
    db = NQDomain(12, 45)
    agent = LateAcceptance(16, 0.2, None, SWAP_ONLY, 10, StepsLimit(200))
    sol = Solver.solve(db, NQCotwin(True), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=2)
    assert sol[1]["simple_value"] < _initial_conflicts()


def test_simulated_annealing_with_cooling():
    db = NQDomain(12, 45)
    agent = SimulatedAnnealing([1.0], 0.999, 0.0, None, SWAP_ONLY, 10,
                               StepsLimit(200))
    sol = Solver.solve(db, NQCotwin(True), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=8)
    assert sol[1]["simple_value"] < _initial_conflicts()


def test_simulated_annealing_auto_temperature():
    # cooling_rate=None -> temperature injected from the termination
    # strategy's accomplish rate (`agent_base.rs:537-552`)
    db = NQDomain(10, 45)
    agent = SimulatedAnnealing([1.0], None, 0.0, None, SWAP_ONLY, 5,
                               StepsLimit(60))
    sol = Solver.solve(db, NQCotwin(True), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=9)
    assert sol[1]["simple_value"] <= _initial_conflicts(10)


def test_lshade_on_continuous():
    db = MIDomain(8, 0, -5.12, 5.12, "sphere")
    agent = LSHADE(24, 32, 0.2, 0.0, 0, 0.5, 0.5, 0.5, 0.0, None, None,
                   0.25, 10, StepsLimit(80))
    sol = Solver.solve(db, MICotwin(), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=4)
    # random sphere values in [-5.12, 5.12]^8 average ~8*8.7=70;
    # LSHADE should get close to 0
    assert sol[1]["simple_value"] < 10.0


def test_lshade_on_mixed_integer():
    db = MIDomain(4, 4, -5.12, 5.12, "sphere")
    agent = LSHADE(16, 32, 0.2, 0.1, 1, 0.5, 0.5, 0.5, 0.0, None, None,
                   0.25, 10, StepsLimit(60))
    sol = Solver.solve(db, MICotwin(), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=14)
    values = [v for _n, v in sol[0]]
    # integer slots must come back as ints
    assert all(float(v) == int(v) for v in values[4:])
    assert sol[1]["simple_value"] < 40.0


def test_ga_on_mixed_integer():
    db = MIDomain(3, 3, -5.12, 5.12, "rastrigin")
    agent = GeneticAlgorithm(32, 0.8, 0.2, 0.0, 1.0, None, 0.1, 10,
                             StepsLimit(60))
    sol = Solver.solve(db, MICotwin(), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=21)
    assert sol[1]["simple_value"] < 60.0


def test_sa_auto_temperature_per_step_schedule():
    # the runner lerps inverted_accomplish_rate .. _end across the chunk's
    # steps (reference injects the rate before EVERY step,
    # `agent_base.rs:537-552`); the temperature stored after the chunk is
    # the one used at the last step: start + (end-start)*(n-1)/n
    import jax
    import jax.numpy as jnp
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.parallel import IslandRunner

    db = NQDomain(8, 45)
    domain = db.build_domain_from_scratch()
    cotwin = NQCotwin(False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    agent = SimulatedAnnealing([1.0], None, 0.0, None, SWAP_ONLY, 4,
                               StepsLimit(100))
    kernel = agent.build_kernel(req, None)
    runner = IslandRunner(kernel, n_islands=2, migration_frequency=4)
    state = runner.init(jax.random.key(0))
    alive = jnp.ones((2,), bool)
    extras = {
        "inverted_accomplish_rate": jnp.asarray([1.0, 1.0]),
        "inverted_accomplish_rate_end": jnp.asarray([0.6, 0.2]),
    }
    state = runner.run_chunk(state, jax.random.key(1), alive, extras, 4)
    temps = np.asarray(state["islands"]["temperature"])[:, 0]
    np.testing.assert_allclose(temps[0], 1.0 + (0.6 - 1.0) * 3 / 4, rtol=1e-12)
    np.testing.assert_allclose(temps[1], 1.0 + (0.2 - 1.0) * 3 / 4, rtol=1e-12)


def test_steps_left_budget_freezes_islands():
    # a full-size chunk with per-island budgets must advance exactly
    # budget[i] steps on island i (StepsLimit exactness without per-trim
    # recompiles)
    import jax
    import jax.numpy as jnp
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.parallel import IslandRunner
    from greyjack_tpu.agents import TabuSearch

    db = NQDomain(8, 45)
    domain = db.build_domain_from_scratch()
    cotwin = NQCotwin(False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    agent = TabuSearch(8, 0.0, True, None, SWAP_ONLY, 6, StepsLimit(100))
    kernel = agent.build_kernel(req, None)
    runner = IslandRunner(kernel, n_islands=3, migration_frequency=6)
    state = runner.init(jax.random.key(0))
    alive = jnp.ones((3,), bool)
    state = runner.run_chunk(state, jax.random.key(1), alive, {}, 6,
                             steps_left=jnp.asarray([6, 2, 0], jnp.int32))
    steps = np.asarray(state["islands"]["step_id"])
    assert steps.tolist() == [6, 2, 0]


def test_frozen_island_scores_bit_stable():
    # ADVICE r3: an island inactive from its very FIRST delta step must keep
    # its init score (from score_fn) bit-for-bit — the int path's ctx-derived
    # score write is guarded by `accept` exactly like the float path's
    import jax
    import jax.numpy as jnp
    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.parallel import IslandRunner
    from greyjack_tpu.agents import TabuSearch

    domain = generate_instance(20, 2, 4, seed=5, time_windowed=True)
    cotwin = CotwinBuilder(True, True).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    agent = TabuSearch(16, 0.2, True, None, SWAP_ONLY, 4, StepsLimit(100))
    kernel = agent.build_kernel(req, None)
    assert kernel.self_gating
    state = kernel.init_state(jax.random.key(0))
    s0 = np.asarray(state["scores"]).copy()
    p0 = np.asarray(state["population"]).copy()
    # three inactive steps straight from init: every write must be identity
    for i in range(3):
        state = kernel.step(jax.random.key(i), state,
                            {"_active": jnp.bool_(False)})
    np.testing.assert_array_equal(np.asarray(state["scores"]), s0)
    np.testing.assert_array_equal(np.asarray(state["population"]), p0)
    assert int(state["step_id"]) == 0
