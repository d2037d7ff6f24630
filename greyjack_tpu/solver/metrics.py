"""First-class solve metrics + profiler capture (SURVEY.md §5 tracing plan).

The reference's only observability is println-level step logs
(`agent_base.rs:492-521`); round-2 verdict asked for a per-chunk metrics
dict surfaced through the observer plus `jax.profiler` trace integration.

`SolverMetrics` is a host-side collector the caller owns:

    metrics = SolverMetrics()
    Solver.solve(..., metrics=metrics)
    metrics.records      # one dict per chunk
    metrics.summary()    # aggregate throughput + best-score trajectory

Each record: {"chunk", "steps", "wall_ms", "moves", "moves_per_s",
"global_best", "improved", "n_alive", "migrations"}. Observers implementing
`update_metrics(record)` receive every record as it lands (the solution
observer contract `update(solution)` is unchanged,
`solver/observer.py`).

Profiling: `Solver.solve(..., profile_dir="/tmp/trace")` captures a
`jax.profiler` trace of chunks [profile_start, profile_start+profile_chunks)
— bounded so the trace stays small; view with xprof/tensorboard.
"""

from __future__ import annotations

import time


class SolverMetrics:
    def __init__(self):
        self.records = []
        self.t_start = None

    def start(self):
        self.t_start = time.time()

    def add(self, record, observers=None):
        self.records.append(record)
        for obs in observers or ():
            fn = getattr(obs, "update_metrics", None)
            if fn is not None:
                fn(record)

    def summary(self):
        if not self.records:
            return {"chunks": 0, "moves": 0, "moves_per_s": 0.0,
                    "trajectory": []}
        moves = sum(r["moves"] for r in self.records)
        wall = sum(r["wall_ms"] for r in self.records) / 1e3
        return {
            "chunks": len(self.records),
            "moves": moves,
            "moves_per_s": moves / wall if wall > 0 else 0.0,
            "wall_s": wall,
            "trajectory": [
                (r["chunk"], r["global_best"]) for r in self.records
                if r["improved"]
            ],
        }


class ProfileCapture:
    """Bounded jax.profiler trace over a window of chunks."""

    def __init__(self, profile_dir, start_chunk=2, n_chunks=3):
        self.profile_dir = profile_dir
        self.start_chunk = start_chunk
        self.n_chunks = n_chunks
        self._active = False
        self._done = False

    def tick(self, chunk_id):
        """Call once per chunk with the about-to-run chunk id."""
        if self.profile_dir is None or self._done:
            return
        import jax

        if not self._active and chunk_id >= self.start_chunk:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
        elif self._active and chunk_id >= self.start_chunk + self.n_chunks:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
