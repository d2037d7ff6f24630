"""Sweep island x neighbourhood geometry for the flagship VRP bench.

One process, one instance build; each geometry compiles its own chunk
program (persistent-cached). Prints moves/s per geometry so the bench
defaults can be set to the knee of the curve. Set GJ_SWEEP_OUT=path.json
to persist the rows as a versioned artifact (VERDICT r2: benchmark
numbers must be committed artifacts, not code comments).

Run: python scripts/sweep_geometry.py "256,1024,4096" "8,16" [chunk_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.agents import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit
    from greyjack_tpu.parallel import IslandRunner

    neighbour_list = [int(x) for x in
                      (sys.argv[1] if len(sys.argv) > 1 else
                       "256,1024,4096").split(",")]
    island_list = [int(x) for x in
                   (sys.argv[2] if len(sys.argv) > 2 else "8,16").split(",")]
    chunk_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    seconds = float(os.environ.get("GJ_SWEEP_SECONDS", "10"))

    t0 = time.time()
    domain = generate_instance(1000, 8, 40, seed=37, time_windowed=True)
    cotwin = CotwinBuilder(True, False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    print(f"# setup {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)

    rows = []
    for n_islands in island_list:
        for neigh in neighbour_list:
            agent = TabuSearch(neigh, 0.2, True, None,
                               [0.5, 0.5, 0.0, 0.0, 0.0, 0.0], chunk_steps,
                               StepsLimit(10**9))
            kernel = agent.build_kernel(req, None)
            runner = IslandRunner(kernel, n_islands=n_islands,
                                  migration_frequency=chunk_steps)
            key = jax.random.key(0)
            state = runner.init(key)
            alive = jnp.ones((n_islands,), bool)
            t0 = time.time()
            state = runner.run_chunk(state, jax.random.key(1), alive, {},
                                     chunk_steps)
            jax.block_until_ready(state)
            compile_s = time.time() - t0

            moves_per_chunk = n_islands * neigh * chunk_steps
            chunks = 0
            t0 = time.time()
            while True:
                state = runner.run_chunk(state, jax.random.key(100 + chunks),
                                         alive, {}, chunk_steps)
                chunks += 1
                if chunks % 4 == 0:
                    jax.block_until_ready(state)
                    if time.time() - t0 > seconds:
                        break
            jax.block_until_ready(state)
            elapsed = time.time() - t0
            thr = chunks * moves_per_chunk / elapsed
            print(f"islands={n_islands:3d} neigh={neigh:5d} steps={chunk_steps}"
                  f" compile={compile_s:6.1f}s chunks={chunks:4d}"
                  f" {thr:12.0f} moves/s"
                  f" step={elapsed/chunks/chunk_steps*1e3:8.3f} ms",
                  flush=True)
            rows.append({"islands": n_islands, "neighbours": neigh,
                         "chunk_steps": chunk_steps,
                         "moves_per_s": round(thr, 1),
                         "step_ms": round(elapsed / chunks / chunk_steps * 1e3,
                                          3),
                         "compile_s": round(compile_s, 1)})

    out = os.environ.get("GJ_SWEEP_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({"instance": "synthetic-tw-d8-n1000-k40",
                       "backend": jax.default_backend(), # noqa
                       "rows": rows}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
