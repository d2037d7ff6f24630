"""Microbench the constructs inside `_delta_parts_small` at flagship shapes.

Per neighbour the kernel extracts/patches a handful of (route, slot) cells
of [A, R] payload buffers. Three candidate formulations, timed on the live
backend at the bench geometry (P=16384, A=4, R=100, KD=2):

  extract: read x[er[e], el[e]] for 3KD cells
    - onehot: sum over broadcast [3KD, A, R] masks (round-1 formulation)
    - index:  x[er, el] batched gather
  patch: write vals into KD (route, slot) cells
    - onehot: any/sum over [KD, A, R] one-hot grids
    - where:  KD unrolled [A, R] where-passes
    - scatter: x.at[er, el].set(vals, mode="drop")

Run: python scripts/bench_delta_ops.py [P]
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

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    A, R, KD = 4, 100, 2
    E = 3 * KD
    print(f"backend={jax.default_backend()} P={P} A={A} R={R} KD={KD}",
          flush=True)

    key = jax.random.key(0)
    x = jax.random.randint(key, (P, A, R), 0, 1000, jnp.int32)
    er = jax.random.randint(key, (P, E), 0, A, jnp.int32)
    el = jax.random.randint(key, (P, E), 0, R, jnp.int32)
    vals = jax.random.randint(key, (P, E), 0, 1000, jnp.int32)
    idxa = jnp.arange(A, dtype=jnp.int32)
    jr = jnp.arange(R, dtype=jnp.int32)

    def extract_onehot(x, er, el):
        def one(xb, erb, elb):
            pair = ((idxa[None, :, None] == erb[:, None, None])
                    & (jr[None, None, :] == elb[:, None, None]))
            return jnp.sum(jnp.where(pair, xb[None], 0), axis=(1, 2),
                           dtype=jnp.int32)
        return jax.vmap(one)(x, er, el)

    def extract_index(x, er, el):
        def one(xb, erb, elb):
            return xb[erb, elb]
        return jax.vmap(one)(x, er, el)

    def patch_onehot(x, er, el, vals):
        def one(xb, erb, elb, vb):
            im = ((idxa[None, :, None] == erb[:KD, None, None])
                  & (jr[None, None, :] == elb[:KD, None, None]))
            ival = jnp.sum(jnp.where(im, vb[:KD, None, None], 0), axis=0,
                           dtype=jnp.int32)
            return jnp.where(jnp.any(im, axis=0), ival, xb)
        return jax.vmap(one)(x, er, el, vals)

    def patch_where(x, er, el, vals):
        def one(xb, erb, elb, vb):
            out = xb
            for k in range(KD):
                m = (idxa == erb[k])[:, None] & (jr == elb[k])[None, :]
                out = jnp.where(m, vb[k], out)
            return out
        return jax.vmap(one)(x, er, el, vals)

    def patch_scatter(x, er, el, vals):
        def one(xb, erb, elb, vb):
            return xb.at[erb[:KD], elb[:KD]].set(vb[:KD], mode="drop")
        return jax.vmap(one)(x, er, el, vals)

    for name, fn, args in [
        ("extract_onehot", extract_onehot, (x, er, el)),
        ("extract_index ", extract_index, (x, er, el)),
        ("patch_onehot  ", patch_onehot, (x, er, el, vals)),
        ("patch_where   ", patch_where, (x, er, el, vals)),
        ("patch_scatter ", patch_scatter, (x, er, el, vals)),
    ]:
        t = bench(fn, *args)
        print(f"{name}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
