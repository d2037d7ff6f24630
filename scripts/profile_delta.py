"""Phase-level profile of the VRP DELTA-scoring step on the live backend.

Times each stage of the delta pipeline (jitted, warmed, block_until_ready):
  move_d    — move_population_delta (bounded-delta sampler)
  ctx       — build_base_ctx (O(N) base pass; once per chunk)
  parts     — _delta_parts minus route metrics (patch analysis + rebuild)
  sortbuf   — the jnp.sort of the rebuilt [A, R+K] route buffers alone
  metrics   — _route_metrics on rebuilt buffers (gathers + max-plus scan)
  score_d   — request_score_delta (full neighbourhood)
  update    — update_ctx for one winner
  step      — full TS delta step

Run: python scripts/profile_delta.py [n_customers] [neighbours]
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
    from greyjack_tpu.models.vrp import cotwin_builder as vrp_cb
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.ops import moves
    from greyjack_tpu.agents.tabu_search import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit

    n_customers = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    neigh = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_islands = 8
    P = n_islands * neigh

    print(f"backend={jax.default_backend()} n={n_customers} P={P}", flush=True)

    domain = generate_instance(n_customers, 8, 40, seed=0, time_windowed=True)
    cotwin = CotwinBuilder(True, False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    vm = req.variables_manager
    utils = req._delta_utils()

    key = jax.random.key(0)
    base = jax.block_until_ready(vm.sample_variables(key, 1)[0])
    cfg = moves.MoverConfig(vm, 0.2, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0])
    tabu = cfg.init_tabu_state()

    results = {}

    def move_d(k, b):
        return moves.move_population_delta(k, b, P, vm, cfg, tabu)[0]

    results["move_d"] = bench(move_d, key, base)
    deltas = jax.block_until_ready(jax.jit(move_d)(key, base))

    results["ctx"] = bench(req.build_base_ctx, base)
    ctx = jax.block_until_ready(jax.jit(req.build_base_ctx)(base))

    # parts without metrics: monkey-profile by timing pieces inline
    def rebuild_only(ctx, delta):
        d = moves.dedupe_delta(delta)
        schema = utils["delta_schema"]
        k = utils["k_vehicles"]
        n = ctx["v"].shape[0]
        kd = d["positions"].shape[0]
        rows = schema["var_row"][d["positions"]]
        cols = schema["var_col"][d["positions"]]
        valid = d["valid"]
        nv = jnp.round(d["values"]).astype(jnp.int32)
        is_veh = cols == 0
        rid = jnp.where(valid, rows, n)
        idx = jnp.arange(kd)
        eqr = rid[:, None] == rid[None, :]
        rep = valid & ~jnp.any(eqr & (idx[None, :] < idx[:, None]), axis=1)
        veh_match = eqr & is_veh[None, :] & valid[None, :]
        old_v = ctx["v"][rows]
        new_v = jnp.where(jnp.any(veh_match, axis=1),
                          nv[jnp.argmax(veh_match, axis=1)], old_v)
        veh_changed = rep & (new_v != old_v)
        av = jnp.concatenate([jnp.where(rep, old_v, k),
                              jnp.where(veh_changed, new_v, k)])
        av_safe = jnp.minimum(av, k - 1)
        base_buf = ctx["r_stop"][av_safe]
        rm_rows = jnp.where(veh_changed, rows, n)
        cleared = jnp.where(
            jnp.any(base_buf[:, :, None] == rm_rows[None, None, :], axis=2),
            n, base_buf)
        ins = jnp.where(
            veh_changed[None, :] & (new_v[None, :] == av[:, None]),
            rows[None, :], n)
        return jnp.concatenate([cleared, ins], axis=1)

    def parts_phase(ctx, deltas):
        return jax.vmap(lambda d: rebuild_only(ctx, d))(deltas)

    results["parts"] = bench(parts_phase, ctx, deltas)
    unsorted = jax.block_until_ready(jax.jit(parts_phase)(ctx, deltas))

    def sort_phase(u):
        return jnp.sort(u, axis=-1)

    results["sortbuf"] = bench(sort_phase, unsorted)
    bufs1 = jax.block_until_ready(jax.jit(sort_phase)(unsorted))

    a = bufs1.shape[1]

    def metrics_phase(ctx, key_bufs):
        veh = jnp.zeros((a,), jnp.int32)

        def one(kb):
            bufs = {"r_stop": kb}
            for name in vrp_cb._PAYLOAD_KEYS[1:]:
                bufs[name] = jnp.zeros_like(kb)
            return vrp_cb._buffer_metrics(bufs, veh, utils)

        return jax.vmap(one)(key_bufs)

    results["metrics"] = bench(metrics_phase, ctx, bufs1)

    results["score_d"] = bench(req.request_score_delta, ctx, deltas)

    one = jax.tree.map(lambda x: x[0], deltas)
    results["update"] = bench(req.update_ctx, ctx, one)

    agent = TabuSearch(neigh, 0.2, True, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0],
                       10, StepsLimit(10))
    kernel = agent.build_kernel(req, None)

    def full_step(k, state):
        keys = jax.random.split(k, n_islands)
        return jax.vmap(lambda kk, st: kernel.step(kk, st, {}))(keys, state)

    init_keys = jax.random.split(key, n_islands)
    state = jax.block_until_ready(jax.jit(jax.vmap(kernel.init_state))(init_keys))
    results["step"] = bench(full_step, key, state)

    print(f"\n{'phase':<10} {'ms':>10} {'moves/s':>12}")
    for k, t in results.items():
        print(f"{k:<10} {t * 1e3:>10.2f} {P / t:>12.0f}")


if __name__ == "__main__":
    main()
