"""Gather-free join/permutation kernels vs numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from greyjack_tpu.ops import join


def test_sort_merge_lookup_multi_column(rng):
    l, f, n = 50, 4, 120
    table = rng.integers(0, 1000, size=(l, f)).astype(np.int32)
    keys = rng.integers(0, l, size=n).astype(np.int32)
    out = np.asarray(join.sort_merge_lookup(jnp.asarray(table), jnp.asarray(keys)))
    np.testing.assert_array_equal(out, table[keys])


def test_sort_merge_lookup_single_column(rng):
    table = rng.integers(0, 99, size=64).astype(np.int32)
    keys = rng.integers(0, 64, size=200).astype(np.int32)
    out = np.asarray(join.sort_merge_lookup(jnp.asarray(table), jnp.asarray(keys)))
    np.testing.assert_array_equal(out, table[keys])


def test_sort_merge_lookup_vmapped(rng):
    l, f, n, p = 30, 3, 40, 16
    table = rng.integers(0, 500, size=(l, f)).astype(np.int32)
    keys = rng.integers(0, l, size=(p, n)).astype(np.int32)
    fn = jax.vmap(lambda k: join.sort_merge_lookup(jnp.asarray(table), k))
    out = np.asarray(fn(jnp.asarray(keys)))
    for i in range(p):
        np.testing.assert_array_equal(out[i], table[keys[i]])


def test_apply_permutation(rng):
    for n in (8, 100, 1024):
        p = rng.permutation(n).astype(np.int32)
        x = rng.normal(size=n).astype(np.float32)
        y = np.asarray(join.apply_permutation(jnp.asarray(x), jnp.asarray(p)))
        np.testing.assert_array_equal(y, x[p])


def test_counts_from_sorted(rng):
    keys = np.sort(rng.integers(0, 20, size=100)).astype(np.int32)
    expected = 100 - len(set(keys.tolist()))
    assert float(join.counts_from_sorted(jnp.asarray(keys))) == expected
