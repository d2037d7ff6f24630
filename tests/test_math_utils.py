"""Parity tests for rounding semantics (reference `math_utils.rs:5-12` and
the inline tests at `gj_integer.rs:137-182`)."""

import numpy as np
import jax.numpy as jnp

from greyjack_tpu.utils.math_utils import (
    rint,
    rint_jnp,
    round_decimal,
    round_decimal_jnp,
)


def test_rint_ties_toward_ceil():
    # reference: ties go to ceil (floor only when strictly closer)
    assert rint(4.4) == 4.0
    assert rint(4.6) == 5.0
    assert rint(4.5) == 5.0
    assert rint(-2.5) == -2.0
    assert rint(-2.6) == -3.0
    assert rint(0.0) == 0.0


def test_rint_jnp_matches_scalar():
    xs = np.linspace(-10, 10, 401)  # includes many .x5 values
    expected = np.array([rint(x) for x in xs])
    actual = np.asarray(rint_jnp(jnp.asarray(xs)))
    np.testing.assert_array_equal(actual, expected)


def test_round_decimal_truncates():
    # reference round() truncates the scaled fraction (floor), it does not
    # round it: round(1.2345, 3) = 1.234, round(1.9999, 3) = 1.999
    assert round_decimal(1.2345, 3) == 1.234
    assert round_decimal(1.9999, 3) == 1.999
    assert round_decimal(50778.123456, 3) == 50778.123
    assert round_decimal(7.0, 0) == 7.0


def test_round_decimal_jnp_matches_scalar():
    xs = np.abs(np.random.default_rng(0).normal(size=200) * 100)
    for p in (0, 1, 3):
        expected = np.array([round_decimal(float(x), p) for x in xs])
        actual = np.asarray(round_decimal_jnp(jnp.asarray(xs), p))
        np.testing.assert_array_equal(actual, expected)
