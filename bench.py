"""Benchmark: scored moves/s on the flagship VRP workload.

Workload: synthetic multi-depot time-windowed CVRP with 1000 customers, 8
depots, 40 vehicles (the belgium-tw-d8-n1000-k40 analog from the reference's
example list — the repo ships no data files, so the instance is generated,
`examples/vrp/src/main.rs:37`). Solver config: TabuSearch islands, each
scoring a full neighborhood batch per step — the BASELINE "scored moves per
second" metric counts every candidate whose full score row is computed.

vs_baseline: BASELINE.json targets >=100x a 64-thread CPU run of the
reference Rust solver, which publishes no absolute numbers. The baseline is
MEASURED on this machine by `scripts/measure_cpu_baseline.py` (a faithful
C++ port of the reference's fused incremental VRP rescore driven
TabuSearch-style, `incremental_score_calculator.rs:55-139`, per-thread
throughput x 64 via the reference's near-linear-scaling claim) and persisted
in BASELINE_CPU.json; the constant below is the fallback when that file is
absent (last measured 2026-08-18: 13.0k moves/s/thread -> 832k at 64t).

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

REFERENCE_CPU_BASELINE = 8.3e5  # scored moves/s, 64-thread (see docstring)
_baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_CPU.json")
if os.path.exists(_baseline_file):
    with open(_baseline_file) as _f:
        REFERENCE_CPU_BASELINE = json.load(_f)["moves_per_s_64t"]

N_CUSTOMERS = int(os.environ.get("GJ_BENCH_CUSTOMERS", "1000"))
N_DEPOTS = 8
K_VEHICLES = 40
N_ISLANDS = int(os.environ.get("GJ_BENCH_ISLANDS", "8"))
# 4x4096 is the geometry knee for the random-move path (SWEEP_r03.json:
# throughput flat within ~3% from 4x4096 to 16x8192 — it is
# per-move-work-bound, and fewer islands shave the island-vmap overhead)
NEIGHBOURS = int(os.environ.get("GJ_BENCH_NEIGHBOURS", "4096"))
CHUNK_STEPS = int(os.environ.get("GJ_BENCH_CHUNK_STEPS", "10"))
TARGET_SECONDS = float(os.environ.get("GJ_BENCH_SECONDS", "20"))
# sweep-neighbourhood mode (models/vrp/sweep.py): per island-step, score
# every candidate value for SWEEP_TARGETS sampled stops (change + vehicle +
# swap families) from route cumulants instead of NEIGHBOURS random moves.
# Moves are counted with the CONSERVATIVE static lower bound
# (`SweepConfig.conservative_moves_per_step`) so accounting never needs a
# device read; the real count (incl. the vehicle family) is higher.
SWEEP = os.environ.get("GJ_BENCH_SWEEP", "1") != "0"
# 8 islands x 256 targets is the measured knee (DESIGN.md round-4 table)
SWEEP_TARGETS = int(os.environ.get("GJ_SWEEP_TARGETS", "256"))
TABU_RATE = 0.2


def run():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the chunk program compiles in minutes on the
    # remote-compile TPU path; cache hits make driver reruns cheap
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.agents import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit
    from greyjack_tpu.parallel import IslandRunner

    t0 = time.time()
    domain = generate_instance(N_CUSTOMERS, N_DEPOTS, K_VEHICLES, seed=37,
                               time_windowed=True)
    # greedy init runs host-side off the device entirely (numpy rebuild of
    # the distance matrix), so the bench starts from the reference's own
    # feasible greedy solution (`cotwin_builder.rs:153-255`)
    cotwin = CotwinBuilder(True, True).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    agent = TabuSearch(NEIGHBOURS, TABU_RATE, True, None,
                       [0.5, 0.5, 0.0, 0.0, 0.0, 0.0], CHUNK_STEPS,
                       StepsLimit(10**9), sweep=SWEEP,
                       sweep_targets=SWEEP_TARGETS)
    kernel = agent.build_kernel(req, None)
    sweeping = SWEEP and req.supports_sweep
    if sweeping:
        from greyjack_tpu.models.vrp import sweep as sweep_mod
        scfg = sweep_mod.SweepConfig(req, SWEEP_TARGETS, None)
        moves_per_step = scfg.conservative_moves_per_step(
            req._delta_utils(), TABU_RATE)
        print(f"# sweep mode: {SWEEP_TARGETS} targets, "
              f">={moves_per_step} moves/island-step (conservative)",
              flush=True)
    else:
        moves_per_step = NEIGHBOURS
    runner = IslandRunner(kernel, n_islands=N_ISLANDS,
                          migration_frequency=CHUNK_STEPS)
    print(f"# setup {time.time()-t0:.1f}s on {jax.devices()[0].platform}",
          flush=True)

    key = jax.random.key(0)
    state = runner.init(key)
    alive = jnp.ones((N_ISLANDS,), bool)

    # warmup/compile
    t0 = time.time()
    state = runner.run_chunk(state, jax.random.key(1), alive, {}, CHUNK_STEPS)
    jax.block_until_ready(state)
    print(f"# compile+first chunk {time.time()-t0:.1f}s", flush=True)

    moves_per_chunk = N_ISLANDS * moves_per_step * CHUNK_STEPS
    chunks = 0
    t0 = time.time()
    while True:
        state = runner.run_chunk(state, jax.random.key(100 + chunks), alive,
                                 {}, CHUNK_STEPS)
        chunks += 1
        if chunks % 4 == 0:
            jax.block_until_ready(state)
            if time.time() - t0 > TARGET_SECONDS:
                break
    jax.block_until_ready(state)
    elapsed = time.time() - t0
    throughput = chunks * moves_per_chunk / elapsed
    print(f"# {chunks} chunks in {elapsed:.2f}s", flush=True)
    if os.environ.get("GJ_BENCH_FETCH_SCORE"):
        # device->host fetches over the axon tunnel are extremely slow
        # (minutes); the score read is opt-in for local/CPU runs
        best = np.asarray(state["global_score"])
        print(f"# best score {best.tolist()}", flush=True)
        if sweeping:
            # exact device-side candidate counter (incl. the vehicle family
            # the conservative accounting omits)
            exact_moves = int(np.asarray(
                state["islands"]["sweep_scored"]).sum())
            print(f"# exact scored-move counter {exact_moves} "
                  f"(counted {(chunks + 1) * moves_per_chunk})", flush=True)
    print(json.dumps({
        "metric": "vrp_scored_moves_per_s",
        "value": round(throughput, 1),
        "unit": "moves/s",
        "vs_baseline": round(throughput / REFERENCE_CPU_BASELINE, 3),
    }), flush=True)


def main():
    """Crash-proof driver entry: failures fall back through a ladder of
    paths — sweep (default) -> random-move delta + Pallas -> pure XLA
    (`GJ_NO_PALLAS=1`). Each rung is a trace-time static, so a crash
    anywhere (compile OOM, Mosaic regression, runtime fault) retries on the
    next-simpler program. Round 2 died for lack of exactly this fallback
    (VERDICT round-2 item 1)."""
    global SWEEP
    fallbacks = [{}, {"sweep_off": True}, {"sweep_off": True,
                                           "GJ_NO_PALLAS": "1"}]
    for i, fb in enumerate(fallbacks):
        try:
            run()
            return
        except Exception as e:  # noqa: BLE001 - last-resort bench fallback
            if i == len(fallbacks) - 1:
                raise
            nxt = fallbacks[i + 1]
            msg = str(e).replace("\n", " ")[:300]
            print(f"# bench path failed ({type(e).__name__}: {msg}); "
                  f"retrying with {nxt}", flush=True)
            if nxt.get("sweep_off"):
                SWEEP = False
            if nxt.get("GJ_NO_PALLAS"):
                os.environ["GJ_NO_PALLAS"] = "1"
            import jax
            jax.clear_caches()  # drop programs traced with the old kernel


if __name__ == "__main__":
    main()
