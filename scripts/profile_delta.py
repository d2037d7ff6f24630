"""Phase-level profile of the VRP DELTA-scoring step on the live backend.

Times each stage of the delta pipeline (jitted, warmed, block_until_ready):
  move_d    — move_population_delta (bounded-delta sampler)
  ctx       — build_base_ctx (O(N) base pass; once per chunk)
  score_d   — request_score_delta (full neighbourhood, v2 shift-merge path
              for narrow move sets, variadic-sort path otherwise)
  argmin    — lexicographic argmin over the neighbourhood scores
  update    — update_ctx for one winner
  step      — full TS delta step (everything fused in one program)

Run: python scripts/profile_delta.py [n_customers] [neighbours] [islands]
Env: GJ_PROF_MOVES="0.5,0.5,0,0,0,0" to change the move mix.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=10):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.ops import moves, lexico
    from greyjack_tpu.agents.tabu_search import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit

    n_customers = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    neigh = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_islands = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    probas = [float(x) for x in os.environ.get(
        "GJ_PROF_MOVES", "0.5,0.5,0,0,0,0").split(",")]
    P = n_islands * neigh

    print(f"backend={jax.default_backend()} n={n_customers} P={P} "
          f"probas={probas}", flush=True)

    domain = generate_instance(n_customers, 8, 40, seed=0, time_windowed=True)
    cotwin = CotwinBuilder(True, False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, 0.2, None, probas)
    print(f"delta_width={cfg.delta_width} k_sel={cfg.k_sel}", flush=True)
    tabu = cfg.init_tabu_state()

    key = jax.random.key(0)
    base = jax.block_until_ready(vm.sample_variables(key, 1)[0])

    results = {}

    def move_d(k, b):
        return moves.move_population_delta(k, b, P, vm, cfg, tabu)[0]

    results["move_d"] = bench(move_d, key, base)
    deltas = jax.block_until_ready(jax.jit(move_d)(key, base))

    results["ctx"] = bench(req.build_base_ctx, base)
    ctx = jax.block_until_ready(jax.jit(req.build_base_ctx)(base))

    results["score_d"] = bench(req.request_score_delta, ctx, deltas)
    scores = jax.block_until_ready(
        jax.jit(req.request_score_delta)(ctx, deltas))

    results["argmin"] = bench(lexico.lex_argmin, scores)

    one = jax.tree.map(lambda x: x[0], deltas)
    results["update"] = bench(req.update_ctx, ctx, one)

    agent = TabuSearch(neigh, 0.2, True, None, probas, 10, StepsLimit(10))
    kernel = agent.build_kernel(req, None)

    def full_step(k, state):
        keys = jax.random.split(k, n_islands)
        return jax.vmap(lambda kk, st: kernel.step(kk, st, {}))(keys, state)

    init_keys = jax.random.split(key, n_islands)
    state = jax.block_until_ready(jax.jit(jax.vmap(kernel.init_state))(init_keys))
    results["step"] = bench(full_step, key, state)

    print(f"\n{'phase':<10} {'ms':>10} {'moves/s':>12}")
    for k, t in results.items():
        print(f"{k:<10} {t * 1e3:>10.2f} {P / t:>12.0f}", flush=True)


if __name__ == "__main__":
    main()
