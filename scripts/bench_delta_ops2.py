"""Second round of `_delta_parts_small` construct experiments.

Hypotheses for the ~1.2ms floor of round 1 (bench_delta_ops.py) vs the
0.036ms fully-fused roll pipeline:
  (a) vmap lowering of per-sample scalar indexing breaks fusion
  (b) [P, 4, 100] pads to [P, 8, 128] tiles (2.56x waste)
  (c) the where-chain materializes; a fused consumer would not

Variants: direct broadcasting without vmap, flat [P, A*R] layout, and a
patch that is CONSUMED by a reduction instead of materialized.

Run: python scripts/bench_delta_ops2.py [P]
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
    xf = x.reshape(P, A * R)
    er = jax.random.randint(key, (P, E), 0, A, jnp.int32)
    el = jax.random.randint(key, (P, E), 0, R, jnp.int32)
    cell = er * R + el
    vals = jax.random.randint(key, (P, E), 0, 1000, jnp.int32)
    idxa = jnp.arange(A, dtype=jnp.int32)
    jr = jnp.arange(R, dtype=jnp.int32)
    iar = jnp.arange(A * R, dtype=jnp.int32)

    def patch_direct(x, er, el, vals):
        out = x
        for k in range(KD):
            m = ((idxa[None, :, None] == er[:, k, None, None])
                 & (jr[None, None, :] == el[:, k, None, None]))
            out = jnp.where(m, vals[:, k, None, None], out)
        return out

    def patch_flat(xf, cell, vals):
        out = xf
        for k in range(KD):
            m = iar[None, :] == cell[:, k, None]
            out = jnp.where(m, vals[:, k, None], out)
        return out

    def patch_flat_fused(xf, cell, vals):
        # patch consumed by a reduce -> XLA may fuse away the materialization
        out = xf
        for k in range(KD):
            m = iar[None, :] == cell[:, k, None]
            out = jnp.where(m, vals[:, k, None], out)
        return jnp.sum(out, axis=1, dtype=jnp.int32)

    def extract_direct(x, er, el):
        outs = []
        for e in range(E):
            m = ((idxa[None, :, None] == er[:, e, None, None])
                 & (jr[None, None, :] == el[:, e, None, None]))
            outs.append(jnp.sum(jnp.where(m, x, 0), axis=(1, 2),
                                dtype=jnp.int32))
        return jnp.stack(outs, axis=1)

    def extract_flat(xf, cell):
        outs = []
        for e in range(E):
            m = iar[None, :] == cell[:, e, None]
            outs.append(jnp.sum(jnp.where(m, xf, 0), axis=1,
                                dtype=jnp.int32))
        return jnp.stack(outs, axis=1)

    def extract_flat_onepass(xf, cell):
        # all E cells in ONE pass over [P, A*R]
        m = iar[None, None, :] == cell[:, :, None]        # [P, E, AR]
        return jnp.sum(jnp.where(m, xf[:, None, :], 0), axis=2,
                       dtype=jnp.int32)

    def extract_dot(xf, cell):
        # one-hot matmul on the MXU: [P, E, AR] bf16 x [P, AR] bf16
        oh = (iar[None, None, :] == cell[:, :, None]).astype(jnp.bfloat16)
        return jnp.einsum("pea,pa->pe", oh, xf.astype(jnp.bfloat16))

    def roll_merge_6key(x, shifts):
        # the actual merge loop shape: 5 masked rolls x 6 keys, fused
        jrr = jr
        outs = []
        for _ in range(6):
            out = jnp.zeros_like(x)
            for s in range(-KD, KD + 1):
                m = shifts == s
                keep = (jrr >= s) if s >= 0 else (jrr < R + s)
                out = out + jnp.where(keep[None, None, :],
                                      jnp.roll(jnp.where(m, x, 0), s, axis=2),
                                      0)
            outs.append(out)
        return sum(jnp.sum(o, axis=2, dtype=jnp.int32) for o in outs)

    shifts = jax.random.randint(key, (P, A, R), -KD, KD + 1, jnp.int32)

    for name, fn, args in [
        ("patch_direct     ", patch_direct, (x, er, el, vals)),
        ("patch_flat       ", patch_flat, (xf, cell, vals)),
        ("patch_flat_fused ", patch_flat_fused, (xf, cell, vals)),
        ("extract_direct   ", extract_direct, (x, er, el)),
        ("extract_flat     ", extract_flat, (xf, cell)),
        ("extract_flat_1pass", extract_flat_onepass, (xf, cell)),
        ("extract_dot(MXU) ", extract_dot, (xf, cell)),
        ("roll_merge_6key  ", roll_merge_6key, (x, shifts)),
    ]:
        t = bench(fn, *args)
        print(f"{name}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
