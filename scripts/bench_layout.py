"""Layout experiment: leading vs trailing batch axis for the delta kernel.

The shift-merge delta scorer is elementwise/scan work on per-neighbour
[A=4, R~100] grids. vmap puts the population axis FIRST -> [P, 4, 100]
tensors whose minor dims waste VPU tiles ((8,128) f32 tiling: 4/8 sublanes,
100/128 lanes ~ 2.5x waste). The same math with the population axis LAST
([4, 100, P]) puts the huge axis on lanes.

This script times a representative op mix (masked rolls over the R axis,
cumsum+cummax lateness prefix, where-selects, row reductions) in both
layouts on the live backend.

Run: python scripts/bench_layout.py [P] [A] [R]
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
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    KD = 2
    print(f"backend={jax.default_backend()} P={P} A={A} R={R}", flush=True)

    key = jax.random.key(0)
    x_lead = jax.random.randint(key, (P, A, R), 0, 1000, jnp.int32)
    x_trail = jnp.transpose(x_lead, (1, 2, 0))
    shift_lead = jax.random.randint(key, (P, A, R), -KD, KD + 1, jnp.int32)
    shift_trail = jnp.transpose(shift_lead, (1, 2, 0))

    def work_lead(x, shift):
        # merge: 2KD+1 masked rolls along R (axis 2), 6 payload keys folded
        # into one loop pass here (same element count)
        jr = jnp.arange(R, dtype=jnp.int32)
        out = jnp.zeros_like(x)
        for s in range(-KD, KD + 1):
            m = shift == s
            keep = (jr >= s) if s >= 0 else (jr < R + s)
            for _ in range(6):
                out = out + jnp.where(keep[None, None, :],
                                      jnp.roll(jnp.where(m, x, 0), s, axis=2),
                                      0)
        # lateness prefix: cumsum + cummax along R
        p = jnp.cumsum(out, axis=2)
        post = p + jax.lax.cummax(out - p, axis=2)
        late = jnp.maximum(post - x, 0)
        return jnp.sum(late, axis=2, dtype=jnp.int32)

    def work_trail(x, shift):
        jr = jnp.arange(R, dtype=jnp.int32)
        out = jnp.zeros_like(x)
        for s in range(-KD, KD + 1):
            m = shift == s
            keep = (jr >= s) if s >= 0 else (jr < R + s)
            for _ in range(6):
                out = out + jnp.where(keep[None, :, None],
                                      jnp.roll(jnp.where(m, x, 0), s, axis=1),
                                      0)
        p = jnp.cumsum(out, axis=1)
        post = p + jax.lax.cummax(out - p, axis=1)
        late = jnp.maximum(post - x, 0)
        return jnp.sum(late, axis=1, dtype=jnp.int32)

    t = bench(work_lead, x_lead, shift_lead)
    print(f"lead  [P,A,R]: {t*1e3:8.3f} ms", flush=True)
    t = bench(work_trail, x_trail, shift_trail)
    print(f"trail [A,R,P]: {t*1e3:8.3f} ms", flush=True)

    # one-hot insert grids [KD, A, R] vs [KD, A, R->P-last]
    er = jax.random.randint(key, (P, 3 * KD), 0, 2 * KD, jnp.int32)
    el = jax.random.randint(key, (P, 3 * KD), 0, R, jnp.int32)
    er_t = er.T
    el_t = el.T
    idxa = jnp.arange(2 * KD, dtype=jnp.int32)
    jr = jnp.arange(R, dtype=jnp.int32)

    def onehot_lead(x, er, el):
        pair = ((idxa[None, None, :, None] == er[:, :, None, None])
                & (jr[None, None, None, :] == el[:, :, None, None]))
        return jnp.sum(jnp.where(pair, x[:, None], 0), axis=(2, 3),
                       dtype=jnp.int32)

    def onehot_trail(x, er, el):
        pair = ((idxa[:, None, None, None] == er[None, :, :, None])
                & (jr[None, None, None, :] == el[None, :, :, None])
                .transpose(0, 1, 3, 2))
        # pair: [2KD, 3KD, R, P]; x: [A,R,P]
        return jnp.sum(jnp.where(pair, x[:, None], 0), axis=(0, 2),
                       dtype=jnp.int32)

    t = bench(onehot_lead, x_lead, er, el)
    print(f"onehot lead : {t*1e3:8.3f} ms", flush=True)
    t = bench(onehot_trail, x_trail, er_t, el_t)
    print(f"onehot trail: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
