"""Microbench: gather/scatter/f64 costs on the live backend under x64.

The r3 stage profile showed the delta pipeline is GATHER-bound (XLA:TPU
gathers run ~10-30ns/element with ~0.1-0.4ms fixed cost per op) and that
even trivial ops (2-element scatter, [16k,3] lex argmin) measured >1ms.
This bench isolates each primitive so the kernel redesign targets real
costs, not guesses. Run: python scripts/bench_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)  # match greyjack runtime config
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def scan_time(body, c0, n=50, reps=3):
    def loop(c):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None,
                            length=n)[0]
    f = jax.jit(loop)
    jax.block_until_ready(f(c0))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(c0))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    P = 16384
    N = 1000
    L = 1002
    print(f"backend={jax.default_backend()} x64=on", flush=True)
    results = {}

    tbl1 = jnp.arange(N, dtype=jnp.int32)
    tbl4 = jnp.arange(N * 4, dtype=jnp.int32).reshape(N, 4)
    dm = jnp.arange(L * L, dtype=jnp.int32)

    c0i = jnp.zeros((P, 2), jnp.int32)

    def pert(c):
        return (c + 1) % N

    results["g_[P,2]<-[N]"] = scan_time(lambda c: tbl1[pert(c)], c0i)
    results["g_[P,2]<-[N,4]rows"] = scan_time(
        lambda c: jnp.sum(tbl4[pert(c)], axis=-1, dtype=jnp.int32) % N, c0i)

    def four_gathers(c):
        i = pert(c)
        return (tbl1[i] + tbl1[(i + 1) % N] + tbl1[(i + 2) % N]
                + tbl1[(i + 3) % N]) % N

    results["4x g_[P,2]<-[N]"] = scan_time(four_gathers, c0i)

    c14 = jnp.zeros((P, 14), jnp.int32)
    results["g_[P,14]<-dm4MB"] = scan_time(
        lambda c: dm[(c + 1) % (L * L)] % 100003, c14)
    c6 = jnp.zeros((P, 6), jnp.int32)
    results["g_[P,6]<-dm4MB"] = scan_time(
        lambda c: dm[(c + 1) % (L * L)] % 100003, c6)

    # scatter costs
    kt = jnp.zeros((40, 128), jnp.int32)

    def scat_rows(c):
        rows = (c[:4] + 1) % 40
        return c.at[:4].set(kt.at[rows].set(c[4] % 7).sum(axis=1)[:4] % N)

    results["scat4rows_[40,128]"] = scan_time(
        scat_rows, jnp.zeros((8,), jnp.int32))

    row = jnp.zeros((2000,), jnp.float64)

    def scat2(c):
        r, i = c
        r = r.at[(i % 2000, (i + 7) % 2000),].set(1.0)
        return (r, i + 1)

    results["scat2_[2000]f64"] = scan_time(
        scat2, (row, jnp.zeros((), jnp.int32)))

    # lex argmin over [P, 3] f64
    from greyjack_tpu.ops import lexico
    sc = jax.random.uniform(jax.random.key(0), (P, 3), jnp.float64)

    def am(c):
        s = sc + c
        return lexico.lex_argmin(s).astype(jnp.float64) * 1e-9

    results["lex_argmin_[P,3]f64"] = scan_time(am, jnp.zeros((), jnp.float64))

    # f32 variant: is f64 emulation the cost?
    sc32 = sc.astype(jnp.float32)

    def am32(c):
        s = sc32 + c
        return lexico.lex_argmin(s).astype(jnp.float32) * 1e-9

    results["lex_argmin_[P,3]f32"] = scan_time(
        am32, jnp.zeros((), jnp.float32))

    # one-hot matmul lookup alternative: [P,K]@[K,128]
    K = 40
    ctxm = jnp.arange(K * 128, dtype=jnp.float32).reshape(K, 128)
    ids = jnp.zeros((P,), jnp.int32)

    def onehot(c):
        i = (ids + c) % K
        oh = (i[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
        out = oh @ ctxm
        return c + (jnp.sum(out[:, 0]).astype(jnp.int32) & 1)

    results["onehot_[P,40]@[40,128]"] = scan_time(
        onehot, jnp.zeros((), jnp.int32))

    # big f64 elementwise (population-scale)
    pop = jnp.zeros((P, 4), jnp.float64)
    results["f64_[P,4]fma"] = scan_time(lambda c: c * 1.000001 + 1.0, pop)

    print(f"\n{'op':<24} {'ms':>9}")
    for k, t in results.items():
        print(f"{k:<24} {t * 1e3:>9.4f}", flush=True)


if __name__ == "__main__":
    main()
