"""N-Queens: golden score parity + end-to-end convergence.

Parity oracle mirrors the reference `all_different` constraint
(`examples/nqueens/src/score/plain_score_calculator.rs:26-67`): per sample,
(len - n_unique) over rows, (col+row) and (col-row). Integer-valued, so
bit-identical equality is required (BASELINE).
"""

import numpy as np
import jax

from greyjack_tpu.models.nqueens import DomainBuilder, CotwinBuilder
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
from greyjack_tpu.agents import TabuSearch, GeneticAlgorithm
from greyjack_tpu.agents.termination_strategies import ScoreLimit, StepsLimit
from greyjack_tpu.score_calculation.scores import SimpleScore
from greyjack_tpu.solver import Solver, SolverLoggingLevels


def oracle_scores(rows_batch, n):
    out = []
    for rows in rows_batch:
        cols = np.arange(n)
        r = (n - len(set(rows.tolist())))
        d = (n - len(set((cols + rows).tolist())))
        a = (n - len(set((cols - rows).tolist())))
        out.append(float(r + d + a))
    return np.array(out)


def test_score_parity(rng):
    n = 32
    db = DomainBuilder(n, 45)
    cot = CotwinBuilder(True).build_cotwin(db.build_domain_from_scratch(), False)
    req = ScoreRequester(cot)
    pop = rng.integers(0, n, size=(64, n)).astype(np.float64)
    scores = np.asarray(req.request_score_plain(pop))
    expected = oracle_scores(pop.astype(np.int64), n)
    np.testing.assert_array_equal(scores[:, 0], expected)


def test_solve_to_zero_tabu_search():
    db = DomainBuilder(16, 45)
    agent = TabuSearch(20, 0.0, True, None, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
                       10, ScoreLimit(SimpleScore(0.0)))
    sol = Solver.solve(db, CotwinBuilder(True), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=7)
    domain = db.build_from_solution(sol)
    assert domain.conflict_count() == 0
    assert sol[1] == {"simple_value": 0.0}


def test_genetic_algorithm_improves():
    db = DomainBuilder(12, 45)
    agent = GeneticAlgorithm(16, 0.5, 0.2, 0.0, 1.0, None, 0.1, 5,
                             StepsLimit(30))
    sol = Solver.solve(db, CotwinBuilder(True), agent, n_jobs=2,
                       logging_level=SolverLoggingLevels.Silent, seed=3)
    initial_conflicts = db.build_domain_from_scratch()
    board0 = initial_conflicts.conflict_count()
    final = sol[1]["simple_value"]
    assert final <= board0
