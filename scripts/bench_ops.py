"""Per-operator microbenches at flagship delta-path shapes (BASELINE.md row 4).

Measures the operators the VRP delta step is built from, at the shapes the
step actually uses (B neighbours, A affected routes, R route cap, K vehicles,
L locations), so design choices are grounded in data instead of folklore:

  row_gather      ctx[name][av]         — [B, A] row gather from [K, R]
  onehot_matmul   one-hot @ table       — same fetch as an MXU matmul
  leg_gather      dmf[flat_idx]         — [B, A, R-1] element gather from [L*L]
  small_gather    dmf[idx]              — [B, KD*3] element gather (dirty legs)
  varsort5        lax.sort 5 operands   — the v1 merge [B, A2, R+KD]
  shift_merge     9x roll+select        — the v2 merge [B, A, R] x 6 payloads
  scatter_rows    buf.at[b,a,slot].set  — [B, A, R] full scatter (rejected alt)
  maxplus         doubling scan         — [B, A, R] lateness rewalk
  gumbel_topk     gumbel [B,L] + top_k  — v1 position selection
  pool_select     uniform pool + dedupe — v2 position selection
  lex_sort_argmin stable sort argmin    — v1 [B, 3] f64
  lex_half_argmin halving reduce argmin — v2

Run: python scripts/bench_ops.py            (defaults B=16384)
Output: one line per op, ms and effective GB/s or Gelem/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=20):
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

    B = int(os.environ.get("BOPS_B", "16384"))
    K, R, L, KD = 40, 100, 1008, 2
    A = 2 * KD
    A2, RW = 32, 116  # v1 geometry

    key = jax.random.key(0)
    table = jax.random.randint(key, (K, R), 0, 1000, jnp.int32)
    tables6 = [jax.random.randint(jax.random.key(i), (K, R), 0, 1000,
                                  jnp.int32) for i in range(6)]
    av = jax.random.randint(key, (B, A), 0, K, jnp.int32)
    dmf = jax.random.randint(key, (L * L,), 0, 1 << 20, jnp.int32)
    legidx = jax.random.randint(key, (B, A, R - 1), 0, L * L, jnp.int32)
    smallidx = jax.random.randint(key, (B, KD * 3), 0, L * L, jnp.int32)
    ops5 = [jax.random.randint(jax.random.key(i), (B, A2, RW), 0, 1000,
                               jnp.int32) for i in range(5)]
    bufs = jax.random.randint(key, (B, A, R), 0, 1000, jnp.int32)
    shifts = jax.random.randint(key, (B, A, R), -KD, KD + 1, jnp.int32)
    slots = jax.random.randint(key, (B, A, R), 0, R, jnp.int32)
    scores = jax.random.uniform(key, (B, 3), jnp.float64)

    results = {}

    def row_gather(av):
        return [t[av] for t in tables6]
    results["row_gather"] = (bench(row_gather, av), B * A * R * 6 * 4)

    def onehot_matmul(av):
        oh = (av[..., None] == jnp.arange(K)).astype(jnp.float32)  # [B, A, K]
        flat = jnp.concatenate([t.astype(jnp.float32) for t in tables6],
                               axis=1)  # [K, R*6]
        out = jax.lax.dot_general(
            oh.reshape(B * A, K), flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.int32)
    results["onehot_matmul"] = (bench(onehot_matmul, av), B * A * R * 6 * 4)

    def leg_gather(idx):
        return dmf[idx]
    results["leg_gather"] = (bench(leg_gather, legidx), B * A * (R - 1) * 4)

    def small_gather(idx):
        return dmf[idx]
    results["small_gather"] = (bench(small_gather, smallidx), B * KD * 3 * 4)

    def varsort5(o):
        return jax.lax.sort(tuple(o), dimension=2, num_keys=1, is_stable=False)
    results["varsort5"] = (bench(varsort5, ops5), B * A2 * RW * 5 * 4)

    def shift_merge(b, sh):
        outs = []
        for _ in range(6):
            acc = jnp.zeros_like(b)
            for s in range(-KD, KD + 1):
                acc = acc + jnp.where(
                    jnp.roll(sh == s, s, axis=2), jnp.roll(b, s, axis=2), 0)
            outs.append(acc)
        return outs
    results["shift_merge"] = (bench(shift_merge, bufs, shifts),
                              B * A * R * 6 * 4)

    def scatter_rows(b, sl):
        ba = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, A, R))
        aa = jnp.broadcast_to(jnp.arange(A)[None, :, None], (B, A, R))
        return jnp.zeros_like(b).at[ba, aa, sl].set(b)
    results["scatter_rows"] = (bench(scatter_rows, bufs, slots),
                               B * A * R * 4)

    def maxplus(adds):
        from greyjack_tpu.ops.routes import _maxplus_scan
        return _maxplus_scan(adds, adds)
    results["maxplus"] = (bench(maxplus, bufs), B * A * R * 4)

    # lateness rewalk alternatives: post = P + max(w0, cummax(floor - P))
    def prefix_cummax(x):
        p = jnp.cumsum(x, axis=2)
        return p + jax.lax.cummax(x - p, axis=2)
    results["prefix_cummax"] = (bench(prefix_cummax, bufs), B * A * R * 4)

    def prefix_doubling(x):
        p = jnp.cumsum(x, axis=-1)
        m = x - p
        d = 1
        neg = jnp.asarray(-(1 << 30), m.dtype)
        while d < m.shape[-1]:
            shifted = jnp.roll(m, d, axis=-1)
            keep = jnp.arange(m.shape[-1]) >= d
            m = jnp.maximum(m, jnp.where(keep, shifted, neg))
            d *= 2
        return p + m
    results["prefix_doubling"] = (bench(prefix_doubling, bufs), B * A * R * 4)

    # gather fixed-cost map: count x table size
    small_tab = jax.random.randint(key, (1008,), 0, 1000, jnp.int32)
    for cnt, tab in ((2, small_tab), (8, small_tab), (22, dmf), (64, dmf)):
        idx = jax.random.randint(key, (B, cnt), 0, tab.shape[0], jnp.int32)
        results[f"gather_{cnt}_{tab.shape[0]}"] = (
            bench(lambda i, t=tab: t[i], idx), B * cnt * 4)

    # batched per-neighbour slot read: take_along vs one-hot masked sum
    slot_idx = jax.random.randint(key, (B, 6), 0, R, jnp.int32)
    route_idx = jax.random.randint(key, (B, 6), 0, A, jnp.int32)

    def take_along(bu, si, ri):
        flat = bu.reshape(B, A * R)
        return jnp.take_along_axis(flat, ri * R + si, axis=1)
    results["take_along6"] = (bench(take_along, bufs, slot_idx, route_idx),
                              B * 6 * 4)

    def onehot_read(bu, si, ri):
        jr = jnp.arange(R, dtype=jnp.int32)
        ja = jnp.arange(A, dtype=jnp.int32)
        m = ((si[:, :, None, None] == jr[None, None, None, :])
             & (ri[:, :, None, None] == ja[None, None, :, None]))
        return jnp.sum(jnp.where(m, bu[:, None, :, :], 0), axis=(2, 3))
    results["onehot_read6"] = (bench(onehot_read, bufs, slot_idx, route_idx),
                               B * 6 * 4)

    GL = 1000  # group size for selection benches

    def gumbel_topk(k):
        keys = jax.random.split(k, B)

        def one(kk):
            g = jax.random.gumbel(kk, (GL,), dtype=jnp.float32)
            return jax.lax.top_k(g, 8)[1]
        return jax.vmap(one)(keys)
    results["gumbel_topk"] = (bench(gumbel_topk, key), B * GL * 4)

    def pool_select(k):
        keys = jax.random.split(k, B)

        def one(kk):
            pool = jax.random.randint(kk, (16,), 0, GL, jnp.int32)
            ii = jnp.arange(16)
            dup = jnp.any((pool[:, None] == pool[None, :])
                          & (ii[None, :] < ii[:, None]), axis=1)
            rank = jnp.cumsum(~dup) - 1
            out = jnp.zeros((8,), jnp.int32).at[
                jnp.where(dup, 8, jnp.minimum(rank, 7))].set(
                pool, mode="drop")
            return out
        return jax.vmap(one)(keys)
    results["pool_select"] = (bench(pool_select, key), B * 16 * 4)

    def lex_sort_argmin(s):
        from greyjack_tpu.ops.lexico import lex_sort_order
        return jax.vmap(lambda x: lex_sort_order(x.reshape(1, 3))[0])(
            s.reshape(B, 1, 3)[:, 0:1].reshape(B, 1, 3)
        ) if False else lex_sort_order(s)[0]
    results["lex_sort_argmin"] = (bench(lex_sort_argmin, scores), B * 3 * 8)

    def lex_half_argmin(s):
        from greyjack_tpu.ops.lexico import lex_less
        n = s.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        arr, ids = s, idx
        m = n
        while m > 1:
            h = (m + 1) // 2
            a, b = arr[:h], arr[h:]
            ia, ib = ids[:h], ids[h:]
            pad = h - b.shape[0]
            if pad:
                b = jnp.concatenate([b, jnp.full((pad, 3), jnp.inf,
                                                 arr.dtype)])
                ib = jnp.concatenate([ib, jnp.full((pad,), n, jnp.int32)])
            # ties -> lower index: b wins only when strictly less
            take_b = lex_less(b, a)
            arr = jnp.where(take_b[:, None], b, a)
            ids = jnp.where(take_b, ib, ia)
            m = h
        return ids[0]
    results["lex_half_argmin"] = (bench(lex_half_argmin, scores), B * 3 * 8)

    print(f"backend={jax.default_backend()} B={B}")
    print(f"{'op':<16} {'ms':>9} {'GB/s':>9}")
    for name, (t, nbytes) in results.items():
        print(f"{name:<16} {t * 1e3:>9.3f} {nbytes / t / 1e9:>9.1f}",
              flush=True)


if __name__ == "__main__":
    main()
