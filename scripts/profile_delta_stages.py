"""Dispatch-free stage attribution for the VRP delta-scoring step.

The plain per-call timing in profile_delta.py includes a ~3ms per-dispatch
floor on the tunneled axon backend, which drowns the small stages. Here
every stage runs K iterations inside one jitted `lax.scan` with a
data-dependent carry (no loop-invariant hoisting), so the per-iteration
time is the real device cost.

Stages:
  move_d      — neighbourhood delta sampler
  pre         — delta_pallas._pre   (XLA analysis + input packing)
  pre+kern    — ... + the Mosaic kernel
  score_full  — score_delta_batch   (pre + kernel + post)
  step        — full TabuSearch delta step (vmapped islands)

Run: python scripts/profile_delta_stages.py [n_customers] [neighbours] [islands]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_ITERS = int(os.environ.get("GJ_PROF_ITERS", "20"))


def scan_time(make_body, init_carry, n=K_ITERS, reps=3):
    import jax

    def loop(c0):
        def body(carry, _):
            return make_body(carry), None
        return jax.lax.scan(body, c0, None, length=n)[0]

    f = jax.jit(loop)
    out = jax.block_until_ready(f(init_carry))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(init_carry)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.models.vrp import delta_pallas
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.ops import moves, lexico
    from greyjack_tpu.agents.tabu_search import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit

    n_customers = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    neigh = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_islands = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    probas = [float(x) for x in os.environ.get(
        "GJ_PROF_MOVES", "0.5,0.5,0,0,0,0").split(",")]
    tabu_rate = float(os.environ.get("GJ_PROF_TABU", "0.2"))
    P = n_islands * neigh

    print(f"backend={jax.default_backend()} n={n_customers} P={P} "
          f"iters={K_ITERS}", flush=True)

    domain = generate_instance(n_customers, 8, 40, seed=0, time_windowed=True)
    cotwin = CotwinBuilder(True, False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, tabu_rate, None, probas)
    tabu = cfg.init_tabu_state()
    utils = req._delta_utils()
    n_vars = vm.variables_count

    key = jax.random.key(0)
    base = jax.block_until_ready(vm.sample_variables(key, 1)[0])
    ctx = jax.block_until_ready(jax.jit(req.build_base_ctx)(base))

    def sample(k):
        return moves.move_population_delta(k, base, P, vm, cfg, tabu)[0]

    deltas0 = jax.block_until_ready(jax.jit(sample)(key))

    results = {}

    # --- harness floor: near-empty body calibrates the per-iteration cost
    # of the scan carry itself (subtract from every stage below)
    results["nil"] = scan_time(lambda i: i + 1, jnp.zeros((), jnp.int32))

    # --- move sampler: carry = key ------------------------------------------
    results["move_d"] = scan_time(
        lambda k: jax.random.fold_in(
            k, jnp.sum(sample(k)["positions"]) & 1),
        key)

    # vmapped sampler: per-island tabu states, the bench's actual shape —
    # isolates the island-vmap penalty of the free-list build (its
    # compaction scatter batches to a 3D scatter under vmap)
    tabu8 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_islands,) + x.shape), tabu)

    def sample_v(k):
        keys = jax.random.split(k, n_islands)
        return jax.vmap(
            lambda kk, ts: moves.move_population_delta(
                kk, base, neigh, vm, cfg, ts)[0]["positions"]
        )(keys, tabu8)

    results["move_d_vmap"] = scan_time(
        lambda k: jax.random.fold_in(k, jnp.sum(sample_v(k)) & 1), key)

    # sampler sub-attribution: PRNG draws alone, and the sampler with the
    # tabu-mask gather disabled (masks=None) — the difference to move_d is
    # the combined mask gather
    def rng_only(k):
        ku, kg, kv = jax.random.split(k, 3)
        u = jax.random.uniform(ku, (P, 9), dtype=jnp.float32)
        uv = jax.random.uniform(kv, (P, 2), dtype=jnp.float64)
        g = jax.random.randint(kg, (P,), 0, max(1, cfg.n_groups))
        dep = (jnp.sum(u[:, 0]) + jnp.sum(uv[:, 0])).astype(jnp.int32) & 1
        return jax.random.fold_in(k, dep + g[0] * 0)

    results["samp_rng"] = scan_time(rng_only, key)

    cfg_nt = moves.MoverConfig(vm, 0.0, None, probas)

    def sample_nomask(k):
        return moves._move_population_delta_narrow(
            k, base, P, vm, cfg_nt, cfg_nt.tabu_free(tabu))[0]

    results["samp_nomask"] = scan_time(
        lambda k: jax.random.fold_in(
            k, jnp.sum(sample_nomask(k)["positions"]) & 1),
        key)

    # --- scoring stages: carry perturbs delta positions (data-dependent) ----
    def perturbed(carry):
        pos = (deltas0["positions"] + carry) % n_vars
        return {**deltas0, "positions": pos}

    def dep(scores):
        return (jnp.sum(scores[:, -1]).astype(jnp.int32)) & 1

    def run_pre(carry):
        inputs, aux = delta_pallas._pre(ctx, perturbed(carry), utils)
        return (jnp.sum(inputs[2][:, 0]) & 1).astype(jnp.int32)

    def run_prekern(carry):
        inputs, aux = delta_pallas._pre(ctx, perturbed(carry), utils)
        outs = delta_pallas._call_kernel(inputs, utils, aux["kd"])
        return (jnp.sum(outs[0][:, 0]) & 1).astype(jnp.int32)

    def run_full(carry):
        s = delta_pallas.score_delta_batch(ctx, perturbed(carry), utils)
        return dep(s)

    def run_ints(carry):
        s = delta_pallas.score_delta_batch_ints(ctx, perturbed(carry), utils)
        return (jnp.sum(s[:, -1]) & 1).astype(jnp.int32)

    def run_dm_only(carry):
        # pre + kernel + a dm gather of the same width as _post's — isolates
        # the random-access gather from the rest of the post assembly
        inputs, aux = delta_pallas._pre(ctx, perturbed(carry), utils)
        outs = delta_pallas._call_kernel(inputs, utils, aux["kd"])
        kd = aux["kd"]
        nr = delta_pallas.n_routes(kd)
        u8 = jnp.sum(outs[1].reshape(-1, nr, 8), axis=1, dtype=jnp.int32)
        v8 = jnp.sum(outs[2].reshape(-1, nr, 8), axis=1, dtype=jnp.int32)
        width = 3 * kd + 2 * nr
        gidx = (jnp.abs(jnp.concatenate([u8, v8], axis=1)[:, :width])
                % utils["dm_flat_milli"].shape[0])
        gvals = utils["dm_flat_milli"][gidx]
        return (jnp.sum(gvals[:, 0]) & 1).astype(jnp.int32)

    c0 = jnp.zeros((), jnp.int32)
    if delta_pallas.eligible(utils, deltas0):
        results["pre"] = scan_time(run_pre, c0)
        results["pre+kern"] = scan_time(run_prekern, c0)
        results["pk+dm"] = scan_time(run_dm_only, c0)
        results["score_full"] = scan_time(run_full, c0)
        results["score_ints"] = scan_time(run_ints, c0)
    else:
        print("# kernel ineligible; skipping pallas stages", flush=True)

    def run_xla(carry):
        d = perturbed(carry)
        calc = req.cotwin.score_calculator
        s = jax.vmap(lambda dd: calc.delta_score_fn(ctx, dd, utils))(d)
        return dep(s)

    if os.environ.get("GJ_PROF_XLA"):
        results["score_xla"] = scan_time(run_xla, c0)

    # --- step tail: argmin + winner + apply + update_ctx + top --------------
    scores0 = jax.block_until_ready(
        jax.jit(lambda d: req.request_score_delta(ctx, d))(deltas0))

    def run_argmin(carry):
        s = scores0 + carry.astype(jnp.float64)
        return (lexico.lex_argmin(s) & 1).astype(jnp.int32)

    results["argmin"] = scan_time(run_argmin, c0)

    ints0 = jax.jit(lambda d: req.request_score_delta_ints(ctx, d))(deltas0)
    if ints0 is not None:
        ints0 = jax.block_until_ready(ints0)

        def run_argmin_i(carry):
            s = ints0 + carry
            return (lexico.lex_argmin(s) & 1).astype(jnp.int32)

        results["argmin_i"] = scan_time(run_argmin_i, c0)

    def run_updctx(carry):
        cx, i = carry
        winner = moves.take_one(deltas0, i % P)
        cx = req.update_ctx(cx, winner)
        return (cx, i + 1)

    results["upd_ctx"] = scan_time(run_updctx, (ctx, jnp.zeros((), jnp.int32)))

    def run_apply(carry):
        row, i = carry
        winner = moves.take_one(deltas0, i % P)
        return (moves.apply_delta(row, winner), i + 1)

    results["apply"] = scan_time(run_apply, (base, jnp.zeros((), jnp.int32)))

    # --- full TS step (vmapped islands): carry = state ----------------------
    agent = TabuSearch(neigh, tabu_rate, True, None, probas, 10, StepsLimit(10))
    kernel = agent.build_kernel(req, None)
    init_keys = jax.random.split(key, n_islands)
    state0 = jax.block_until_ready(
        jax.jit(jax.vmap(kernel.init_state))(init_keys))

    def step_body(carry):
        st, k = carry
        k, sub = jax.random.split(k)
        keys = jax.random.split(sub, n_islands)
        st = jax.vmap(lambda kk, s: kernel.step(kk, s, {}))(keys, st)
        return (st, k)

    results["step"] = scan_time(step_body, (state0, key))

    # flat variant: ONE island with the whole P as its neighbourhood —
    # isolates the island-vmap penalty from the step content
    agent1 = TabuSearch(P, tabu_rate, True, None, probas, 10, StepsLimit(10))
    kernel1 = agent1.build_kernel(req, None)
    state1 = jax.block_until_ready(
        jax.jit(kernel1.init_state)(jax.random.key(1)))

    def step1_body(carry):
        st, k = carry
        k, sub = jax.random.split(k)
        st = kernel1.step(sub, st, {})
        return (st, k)

    results["step_flat"] = scan_time(step1_body, (state1, key))

    print(f"\n{'stage':<12} {'ms':>9} {'moves/s':>12}")
    prev = None
    for kname, t in results.items():
        print(f"{kname:<12} {t * 1e3:>9.3f} {P / t:>12.0f}", flush=True)


if __name__ == "__main__":
    main()
