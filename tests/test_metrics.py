"""Per-chunk solve metrics + profiler capture (SURVEY.md §5 tracing plan;
round-2 verdict item 7)."""

import os

import numpy as np

from greyjack_tpu.models.nqueens import DomainBuilder, CotwinBuilder
from greyjack_tpu.agents import TabuSearch
from greyjack_tpu.agents.termination_strategies import StepsLimit
from greyjack_tpu.solver import (Solver, SolverLoggingLevels, Observer,
                                 SolverMetrics)


class _RecObserver(Observer):
    def __init__(self):
        self.solutions = []
        self.metric_records = []

    def update(self, solution):
        self.solutions.append(solution)

    def update_metrics(self, record):
        self.metric_records.append(record)


def test_metrics_records_and_observer_fanout(tmp_path):
    metrics = SolverMetrics()
    obs = _RecObserver()
    Solver.solve(
        DomainBuilder(8, 42), CotwinBuilder(False),
        TabuSearch(16, 0.0, True, None, [0.0, 1.0, 0, 0, 0, 0], 5,
                   StepsLimit(20)),
        n_jobs=2, logging_level=SolverLoggingLevels.Silent,
        observers=[obs], seed=7, metrics=metrics,
        profile_dir=str(tmp_path / "trace"),
    )
    assert len(metrics.records) >= 4  # 20 steps / 5-step chunks
    r = metrics.records[0]
    for field in ("chunk", "steps", "wall_ms", "moves", "moves_per_s",
                  "global_best", "improved", "n_alive", "migrations"):
        assert field in r
    # 2 islands x 5 steps x 16 neighbours per full chunk
    assert r["moves"] == 2 * 5 * 16
    assert r["moves_per_s"] > 0
    # observer fan-out got every record
    assert obs.metric_records == metrics.records

    s = metrics.summary()
    assert s["chunks"] == len(metrics.records)
    assert s["moves"] == sum(rec["moves"] for rec in metrics.records)
    assert s["moves_per_s"] > 0
    # improvement trajectory is lexicographically non-increasing
    traj = [np.asarray(b) for _, b in s["trajectory"]]
    for a, b in zip(traj, traj[1:]):
        assert tuple(b) <= tuple(a)

    # profiler capture wrote a trace directory (bounded window)
    trace_dir = tmp_path / "trace"
    assert trace_dir.exists() and any(trace_dir.rglob("*"))


def test_metrics_surface_sweep_health_and_kernel_path():
    """Sweep-health counters flow into SolverMetrics records and the kernel
    path is reported (VERDICT r4 item 7 / ADVICE r4 visibility)."""
    from greyjack_tpu.models.tsp import (DomainBuilder as TspDomainBuilder,
                                         CotwinBuilder as TspCotwinBuilder,
                                         generate_uniform_instance)

    metrics = SolverMetrics()
    obs = _RecObserver()
    Solver.solve(
        TspDomainBuilder.from_generator(
            lambda: generate_uniform_instance(24, seed=3)),
        TspCotwinBuilder(True, True),
        TabuSearch(8, 0.2, True, None, [0, .2, .2, .2, .2, .2], 5,
                   StepsLimit(15), sweep=True, sweep_targets=4,
                   sweep_stall_limit=16),
        n_jobs=2, logging_level=SolverLoggingLevels.Silent,
        observers=[obs], seed=11, metrics=metrics,
    )
    assert metrics.records
    for rec in metrics.records:
        assert rec["kernel_path"] == "sweep"
        assert "sweep_scored" in rec and "sweep_nonconv" in rec
    # the cumulative scored counter is monotone and positive
    scored = [rec["sweep_scored"] for rec in metrics.records]
    assert scored[-1] > 0
    assert all(b >= a for a, b in zip(scored, scored[1:]))
    # TSP sweeps are all-exact: no lateness-bound fallbacks possible
    assert metrics.records[-1]["sweep_nonconv"] == 0
    assert obs.metric_records == metrics.records
