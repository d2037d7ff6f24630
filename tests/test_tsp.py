"""TSP: golden score parity (bit-identical f64 soft scores) + convergence.

The oracle mirrors the reference scoring exactly: duplicates penalty
(`tsp/score/plain_score_calculator.rs:34-59`) and tour distance in the
reference summation order (`:62-87`): (depot_leg + return_leg) +
fold(0.0, chain), with the distance matrix truncated to 3 decimals.
"""

import numpy as np

from greyjack_tpu.models.tsp import (
    DomainBuilder,
    CotwinBuilder,
    generate_uniform_instance,
)
from greyjack_tpu.models.tsp.cotwin_builder import greedy_tour
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
from greyjack_tpu.agents import TabuSearch
from greyjack_tpu.agents.termination_strategies import StepsLimit
from greyjack_tpu.solver import Solver, SolverLoggingLevels


def oracle_score(stops, dm):
    hard = float(len(stops) - len(set(stops.tolist())))
    soft = dm[0][stops[0]] + dm[stops[-1]][0]
    chain = 0.0
    for i in range(1, len(stops)):
        chain = chain + dm[stops[i - 1]][stops[i]]
    soft = soft + chain
    return hard, soft


def test_score_parity_bit_identical(rng):
    domain = generate_uniform_instance(40, seed=3)
    cot = CotwinBuilder(True, False, exact_fp_scores=True).build_cotwin(
        domain, False)
    req = ScoreRequester(cot)
    dm = np.asarray(domain.distance_matrix)
    pop = rng.integers(1, 40, size=(32, 39)).astype(np.float64)
    scores = np.asarray(req.request_score_plain(pop))
    for i in range(32):
        hard, soft = oracle_score(pop[i].astype(np.int64), dm)
        assert scores[i, 0] == hard, f"hard mismatch sample {i}"
        assert scores[i, 1] == soft, (
            f"soft mismatch sample {i}: {scores[i, 1]!r} vs {soft!r}"
        )


def test_fast_mode_matches_exact_after_rounding(rng):
    """The default (integer-milli) kernel equals the exact sequential kernel
    to ~1e-12 relative (integer-milli total vs sequential f64 fold)."""
    from greyjack_tpu.utils.math_utils import round_decimal

    domain = generate_uniform_instance(40, seed=7)
    pop = rng.integers(1, 40, size=(16, 39)).astype(np.float64)
    exact = np.asarray(ScoreRequester(
        CotwinBuilder(True, False, exact_fp_scores=True)
        .build_cotwin(domain, False)).request_score_plain(pop))
    fast = np.asarray(ScoreRequester(
        CotwinBuilder(True, False, exact_fp_scores=False)
        .build_cotwin(domain, False)).request_score_plain(pop))
    np.testing.assert_array_equal(exact[:, 0], fast[:, 0])
    np.testing.assert_allclose(exact[:, 1], fast[:, 1], rtol=1e-9, atol=1e-9)


def test_greedy_tour_valid():
    domain = generate_uniform_instance(30, seed=5)
    tour = np.asarray(greedy_tour(domain.distance_matrix))
    assert sorted(tour.tolist()) == list(range(1, 30))


def test_solver_improves_over_greedy():
    domain_gen = lambda: generate_uniform_instance(24, seed=11)
    db = DomainBuilder.from_generator(domain_gen)
    agent = TabuSearch(64, 0.2, True, None, [0.0, 0.2, 0.2, 0.2, 0.2, 0.2],
                       5, StepsLimit(40))
    sol = Solver.solve(db, CotwinBuilder(True, True), agent, n_jobs=2,
                       score_precision=[3, 3],
                       logging_level=SolverLoggingLevels.Silent, seed=1)
    domain = db.build_from_solution(sol)
    # stays a valid permutation (hard score 0) and beats or matches greedy
    assert sol[1]["hard_score"] == 0.0
    assert domain.get_unique_stops_count() == 23

    greedy_ids = np.asarray(greedy_tour(domain.distance_matrix)).tolist()
    domain_greedy = db.build_domain_from_scratch()
    domain_greedy.trip_path = greedy_ids
    assert domain.get_travel_distance() <= domain_greedy.get_travel_distance() + 1e-9
