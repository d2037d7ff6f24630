"""Worker for scripts/measure_scaling.py — one timed flagship-VRP island
run on virtual CPU devices, optionally as one of N `jax.distributed`
processes (the DCN-analog leg). Env (JAX_PLATFORMS, device count, CPU
affinity) must be set by the parent BEFORE the interpreter starts.

Prints one line: SCALING_RESULT {"moves_per_s": ..., ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--islands", type=int, required=True)
    ap.add_argument("--neighbours", type=int, default=256)
    ap.add_argument("--chunk-steps", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--customers", type=int, default=200)
    ap.add_argument("--depots", type=int, default=4)
    ap.add_argument("--vehicles", type=int, default=10)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep-neighbourhood TabuSearch (flagship path)")
    ap.add_argument("--sweep-targets", type=int, default=16)
    ap.add_argument("--mesh", action="store_true",
                    help="shard islands over all devices via shard_map")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.agents import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit
    from greyjack_tpu.parallel import (IslandRunner, init_distributed,
                                       make_island_mesh)

    mesh = None
    if args.coordinator is not None:
        mesh = init_distributed(coordinator_address=args.coordinator,
                                num_processes=args.num_processes,
                                process_id=args.process_id)
    elif args.mesh:
        mesh = make_island_mesh()

    domain = generate_instance(args.customers, args.depots, args.vehicles,
                               seed=11, time_windowed=True)
    cotwin = CotwinBuilder(True, True).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    agent = TabuSearch(args.neighbours, 0.2, True, None,
                       [0.5, 0.5, 0.0, 0.0, 0.0, 0.0], args.chunk_steps,
                       StepsLimit(10**9), sweep=args.sweep,
                       sweep_targets=args.sweep_targets)
    kernel = agent.build_kernel(req, None)
    if args.sweep:
        from greyjack_tpu.models.vrp import sweep as sweep_mod
        scfg = sweep_mod.SweepConfig(req, args.sweep_targets, None)
        moves_per_step = scfg.conservative_moves_per_step(
            req._delta_utils(), 0.2)
    else:
        moves_per_step = args.neighbours
    runner = IslandRunner(kernel, n_islands=args.islands,
                          migration_frequency=args.chunk_steps, mesh=mesh)
    state = runner.init(jax.random.key(0))
    alive = jnp.ones((args.islands,), bool)

    t0 = time.time()
    state = runner.run_chunk(state, jax.random.key(1), alive, {},
                             args.chunk_steps)
    jax.block_until_ready(state)
    compile_s = time.time() - t0

    moves_per_chunk = args.islands * moves_per_step * args.chunk_steps
    chunks = 0
    t0 = time.time()
    while True:
        state = runner.run_chunk(state, jax.random.key(100 + chunks), alive,
                                 {}, args.chunk_steps)
        chunks += 1
        if chunks % 2 == 0:
            jax.block_until_ready(state)
            if time.time() - t0 > args.seconds:
                break
    jax.block_until_ready(state)
    elapsed = time.time() - t0
    print("SCALING_RESULT " + json.dumps({
        "process_id": args.process_id,
        "devices": len(jax.devices()),
        "islands": args.islands,
        "neighbours": args.neighbours,
        "moves_per_s": round(chunks * moves_per_chunk / elapsed, 1),
        "compile_s": round(compile_s, 1),
        "chunks": chunks,
    }), flush=True)


if __name__ == "__main__":
    main()
