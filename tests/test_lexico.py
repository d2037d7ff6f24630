"""Device lexicographic ops vs Python tuple ordering."""

import numpy as np
import jax.numpy as jnp

from greyjack_tpu.ops import lexico


def _rand_rows(rng, n, s):
    # small integer-valued scores to force plenty of ties
    return rng.integers(-2, 3, size=(n, s)).astype(np.float64)


def test_lex_less_matches_tuples(rng):
    for s in (1, 2, 3):
        a = _rand_rows(rng, 50, s)
        b = _rand_rows(rng, 50, s)
        expected = np.array([tuple(x) < tuple(y) for x, y in zip(a, b)])
        actual = np.asarray(lexico.lex_less(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(actual, expected)
        expected_leq = np.array([tuple(x) <= tuple(y) for x, y in zip(a, b)])
        actual_leq = np.asarray(lexico.lex_leq(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(actual_leq, expected_leq)


def test_lex_argmin_first_of_ties(rng):
    rows = _rand_rows(rng, 40, 3)
    rows[7] = rows[23] = [-2, -2, -2]  # duplicate minimum
    idx = int(lexico.lex_argmin(jnp.asarray(rows)))
    assert idx == min(
        i for i, r in enumerate(rows) if tuple(r) == min(map(tuple, rows))
    )


def test_lex_sort_order_stable(rng):
    rows = _rand_rows(rng, 60, 2)
    order = np.asarray(lexico.lex_sort_order(jnp.asarray(rows)))
    py_order = sorted(range(60), key=lambda i: (tuple(rows[i]), i))
    np.testing.assert_array_equal(order, py_order)


def test_lex_sort_scores_with_payload(rng):
    rows = _rand_rows(rng, 30, 2)
    payload = np.arange(30)
    s, p = lexico.lex_sort_scores_with(jnp.asarray(rows), jnp.asarray(payload))
    s, p = np.asarray(s), np.asarray(p)
    assert all(tuple(s[i]) <= tuple(s[i + 1]) for i in range(29))
    np.testing.assert_array_equal(rows[p], s)
