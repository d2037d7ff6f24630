"""Phase-level profile of the TabuSearch/VRP hot step on the live backend.

Times each stage of the scored-move pipeline separately (jitted, warmed,
block_until_ready) so optimization effort goes where the time is:
  move      — move_population (permutation build + apply)
  frames    — strided chromosome -> column slices + fix
  sort      — sort_stops_by_vehicle + apply_permutation of customers
  merge     — iota_table_lookup of packed customer facts
  gather    — the chain-leg dm_flat gather alone
  routes    — vrp_routes_packed (distance + lateness)
  scan      — the max-plus lateness scan alone
  score     — full request_score_plain
  step      — full TS step (move + score + argmin + accept)

Run: python scripts/profile_step.py [n_customers] [neighbours]
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
    from greyjack_tpu.ops import moves, routes, join
    from greyjack_tpu.agents import base as agent_base
    from greyjack_tpu.agents.tabu_search import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit
    from greyjack_tpu.ops import lexico

    n_customers = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    neigh = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_islands = 8
    P = n_islands * neigh

    print(f"backend={jax.default_backend()} devices={len(jax.devices())} "
          f"n={n_customers} P={P}", flush=True)

    domain = generate_instance(n_customers, 8, 40, seed=0, time_windowed=True)
    cb = CotwinBuilder(use_incremental_score_calculation=False,
                       use_greed_init=True)
    cotwin = cb.build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    vm = req.variables_manager
    calc = cotwin.score_calculator
    utils = calc.utility_objects

    key = jax.random.key(0)
    pop = vm.sample_variables(key, P)
    pop = jax.block_until_ready(pop)

    results = {}

    # --- move ---------------------------------------------------------------
    cfg = moves.MoverConfig(vm, 0.2, None, [0.0, 0.5, 0.0, 0.0, 0.25, 0.25])
    tabu = cfg.init_tabu_state()

    def do_moves(k, p):
        return moves.move_population(k, p, vm, cfg, tabu)[0]

    results["move"] = bench(do_moves, key, pop)

    # --- frames -------------------------------------------------------------
    results["frames"] = bench(req.build_frames, pop)

    frames = jax.jit(req.build_frames)(pop)
    v = frames["planning_stops"]["vehicle_id"]
    c = frames["planning_stops"]["customer_id"]
    v, c = jax.block_until_ready((v, c))

    # --- sort ---------------------------------------------------------------
    def sort_phase(v, c):
        sv, perm = jax.vmap(routes.sort_stops_by_vehicle)(v)
        sc = jax.vmap(join.apply_permutation)(c, perm)
        return sv, sc

    results["sort"] = bench(sort_phase, v, c)
    sv, sc = jax.block_until_ready(jax.jit(sort_phase)(v, c))

    # --- merge (packed fact lookup) ------------------------------------------
    def merge_phase(sc):
        return jax.vmap(
            lambda s: join.iota_table_lookup(utils["cust_packed"], s,
                                             with_dups=True)
        )(sc)

    results["merge"] = bench(merge_phase, sc)
    cust_rows, _ = jax.block_until_ready(jax.jit(merge_phase)(sc))

    # --- gather (chain legs) --------------------------------------------------
    dm_flat = utils["dm_flat_milli"]
    L = utils["n_locations"]

    def gather_phase(sc):
        idx = sc[:, :-1] * L + sc[:, 1:]
        return jnp.sum(dm_flat[idx].astype(jnp.int64), axis=-1)

    results["gather"] = bench(gather_phase, sc)

    # --- routes (full packed walk) -------------------------------------------
    def routes_phase(sv, sc, cust_rows):
        return jax.vmap(
            lambda a, b, r: routes.vrp_routes_packed(
                a, b, dm_flat, L, utils["k_vehicles"],
                utils["vehicle_depot_ids"], utils["work_day_start_k"],
                utils["work_day_end_k"], r, True)
        )(sv, sc, cust_rows)

    results["routes"] = bench(routes_phase, sv, sc, cust_rows)

    # --- scan only ------------------------------------------------------------
    ct = cust_rows[:, :, 3]
    cs = cust_rows[:, :, 1]

    def scan_phase(ct, cs):
        big = jnp.asarray(1 << 30, jnp.int32)
        adds = jnp.where(cs > 0, ct, -big)
        floors = cs + ct
        return routes._maxplus_scan(adds, floors)

    results["scan"] = bench(scan_phase, ct, cs)

    # --- full score -----------------------------------------------------------
    results["score"] = bench(req.request_score_plain, pop)

    # --- full TS step ----------------------------------------------------------
    agent = TabuSearch(neigh, 0.2, True, None, [0.0, 0.5, 0.0, 0.0, 0.25, 0.25],
                       10, StepsLimit(10))
    kernel = agent.build_kernel(req, None)

    def full_step(k, state):
        keys = jax.random.split(k, n_islands)
        return jax.vmap(lambda kk, st: kernel.step(kk, st, {}))(keys, state)

    init_keys = jax.random.split(key, n_islands)
    state = jax.jit(jax.vmap(kernel.init_state))(init_keys)
    state = jax.block_until_ready(state)
    results["step"] = bench(full_step, key, state)

    print(f"\n{'phase':<10} {'ms':>10} {'moves/s':>12}")
    for k, t in results.items():
        print(f"{k:<10} {t * 1e3:>10.2f} {P / t:>12.0f}")


if __name__ == "__main__":
    main()
