"""VRP: golden score parity (bit-identical rows) + end-to-end solving +
replanning round-trip.

Oracle mirrors the reference's fused all-in-one constraint
(`examples/vrp/src/score/incremental_score_calculator.rs:32-142`): hard =
1000*duplicates + capacity overflow; medium = lateness walk; soft = route
distances in the reference's f64 summation order.
"""

import numpy as np

from greyjack_tpu.models.vrp import (
    DomainBuilder,
    CotwinBuilder,
    generate_instance,
)
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
from greyjack_tpu.agents import TabuSearch, LateAcceptance
from greyjack_tpu.agents.termination_strategies import StepsLimit
from greyjack_tpu.solver import Solver, SolverLoggingLevels
from greyjack_tpu.solver.initial_solution import InitialSolution


def oracle_score(vehicle_ids, customer_ids, domain):
    dm = np.asarray(domain.distance_matrix)
    k = len(domain.vehicles)
    n_stops = len(customer_ids)
    cust = domain.customers_vec

    dups = 1000.0 * (n_stops - len(set(customer_ids.tolist())))
    loads = np.zeros(k, np.int64)
    for v, c in zip(vehicle_ids, customer_ids):
        loads[v] += cust[c].demand
    caps = np.array([v.capacity for v in domain.vehicles], np.int64)
    overflow = float(np.maximum(loads - caps, 0).sum())

    stops_by_v = [[] for _ in range(k)]
    for v, c in zip(vehicle_ids, customer_ids):
        stops_by_v[v].append(int(c))

    total = 0.0
    lateness = 0
    for v in range(k):
        s = stops_by_v[v]
        if not s:
            total = total + 0.0
            continue
        depot = domain.vehicles[v].depot_vec_id
        d = dm[depot][s[0]] + dm[s[-1]][depot]
        chain = 0.0
        for i in range(1, len(s)):
            chain = chain + dm[s[i - 1]][s[i]]
        total = total + (d + chain)
        if domain.time_windowed:
            arrival = domain.vehicles[v].work_day_start
            for c in s:
                arrival = max(arrival, cust[c].time_window_start)
                if arrival + cust[c].service_time > cust[c].time_window_end:
                    lateness += arrival + cust[c].service_time - cust[c].time_window_end
                arrival += cust[c].service_time
            if arrival > domain.vehicles[v].work_day_end:
                lateness += arrival - domain.vehicles[v].work_day_end
    return dups + overflow, float(lateness), total


def _parity_check(domain, rng, n_samples=24):
    cot = CotwinBuilder(True, False, exact_fp_scores=True).build_cotwin(
        domain, False)
    req = ScoreRequester(cot)
    n_depots = len(domain.depot_vec)
    n_locations = len(domain.customers_vec)
    n_stops = n_locations - n_depots
    k = len(domain.vehicles)

    pop = np.zeros((n_samples, 2 * n_stops))
    pop[:, 0::2] = rng.integers(0, k, size=(n_samples, n_stops))
    pop[:, 1::2] = rng.integers(n_depots, n_locations, size=(n_samples, n_stops))
    scores = np.asarray(req.request_score_plain(pop))
    for i in range(n_samples):
        v_ids = pop[i, 0::2].astype(np.int64)
        c_ids = pop[i, 1::2].astype(np.int64)
        hard, medium, soft = oracle_score(v_ids, c_ids, domain)
        assert scores[i, 0] == hard, f"hard sample {i}: {scores[i,0]} != {hard}"
        assert scores[i, 1] == medium, f"medium sample {i}"
        assert scores[i, 2] == soft, (
            f"soft sample {i}: {scores[i,2]!r} != {soft!r}"
        )


def test_score_parity_cvrp(rng):
    _parity_check(generate_instance(30, 1, 5, seed=2), rng)


def test_score_parity_multidepot_timewindowed(rng):
    _parity_check(generate_instance(30, 3, 6, seed=4, time_windowed=True), rng)


def test_fast_mode_matches_exact_after_rounding(rng):
    from greyjack_tpu.utils.math_utils import round_decimal

    domain = generate_instance(25, 2, 5, seed=13, time_windowed=True)
    n_depots = len(domain.depot_vec)
    n_locations = len(domain.customers_vec)
    n_stops = n_locations - n_depots
    k = len(domain.vehicles)
    pop = np.zeros((16, 2 * n_stops))
    pop[:, 0::2] = rng.integers(0, k, size=(16, n_stops))
    pop[:, 1::2] = rng.integers(n_depots, n_locations, size=(16, n_stops))

    exact = np.asarray(ScoreRequester(
        CotwinBuilder(True, False, exact_fp_scores=True)
        .build_cotwin(domain, False)).request_score_plain(pop))
    fast = np.asarray(ScoreRequester(
        CotwinBuilder(True, False, exact_fp_scores=False)
        .build_cotwin(domain, False)).request_score_plain(pop))
    # hard + medium are integer-exact in both kernels
    np.testing.assert_array_equal(exact[:, 0], fast[:, 0])
    np.testing.assert_array_equal(exact[:, 1], fast[:, 1])
    # fast soft = exactly-rounded integer-milli total; the sequential f64
    # fold drifts by ~1e-12 relative (truncating rounds may still straddle a
    # 0.001 boundary in rare cases, so equality is asserted on the values)
    np.testing.assert_allclose(exact[:, 2], fast[:, 2], rtol=1e-9, atol=1e-9)


def test_greedy_init_feasible():
    domain = generate_instance(40, 2, 8, seed=6)
    cot = CotwinBuilder(True, True).build_cotwin(domain, False)
    req = ScoreRequester(cot)
    import jax

    pop = req.variables_manager.sample_variables(jax.random.key(0), 1)
    scores = np.asarray(req.request_score_plain(pop))
    # greedy init must produce a duplicate-free, capacity-feasible start
    assert scores[0, 0] == 0.0, f"greedy init infeasible: hard={scores[0,0]}"


def test_solver_end_to_end_and_replanning():
    gen = lambda: generate_instance(20, 2, 4, seed=9, time_windowed=True)
    db = DomainBuilder.from_generator(gen)
    cb = CotwinBuilder(True, True)
    agent = TabuSearch(32, 0.2, True, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0],
                       5, StepsLimit(30))
    sol = Solver.solve(db, cb, agent, n_jobs=2, score_precision=[0, 0, 3],
                       logging_level=SolverLoggingLevels.Silent, seed=5)
    assert sol[1]["hard_score"] == 0.0
    domain = db.build_from_solution(sol)
    assert domain.get_unique_stops_count() == 20

    # --- replanning: freeze vehicle 0's customers, re-solve from the domain
    for c in domain.vehicles[0].customers:
        c.frozen = True
    frozen_ids = [c.vec_id for c in domain.vehicles[0].customers]
    agent2 = TabuSearch(16, 0.2, True, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0],
                        5, StepsLimit(10))
    sol2 = Solver.solve(db, cb, agent2, n_jobs=2, score_precision=[0, 0, 3],
                        logging_level=SolverLoggingLevels.Silent, seed=6,
                        initial_solution=InitialSolution.from_domain(domain))
    domain2 = db.build_from_solution(sol2, initial_domain=domain)
    new_v0 = [c.vec_id for c in domain2.vehicles[0].customers]
    # frozen customers must stay with vehicle 0 in the same positions
    assert new_v0[: len(frozen_ids)] == frozen_ids
