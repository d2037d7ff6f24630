"""Numeric helpers matching the reference's rounding semantics.

Reference: `greyjack/src/utils/math_utils.rs:5-12`. Both functions are
implemented twice: a Python-scalar version (host-side bookkeeping) and a
jnp version usable inside jitted kernels. They must agree bit-for-bit.
"""

import math

import jax.numpy as jnp


def rint(x: float) -> float:
    """Round-to-nearest with ties away from floor (toward +inf).

    Reference semantics (`math_utils.rs:5-7`): floor if the value is strictly
    closer to floor, else ceil — i.e. exact halves round up. Equivalent to
    floor(x + 0.5) for finite doubles of the magnitudes used here.
    """
    f = math.floor(x)
    c = math.ceil(x)
    return f if abs(x - f) < abs(c - x) else float(c)


def rint_jnp(x):
    """Vectorized `rint` (ties toward +inf), NOT banker's rounding."""
    f = jnp.floor(x)
    c = jnp.ceil(x)
    return jnp.where(jnp.abs(x - f) < jnp.abs(c - x), f, c)


def round_decimal(value: float, precision: int) -> float:
    """Truncating decimal round, reference `math_utils.rs:9-12`.

    floor(value) + floor(frac(value) * 10^p) / 10^p — note this truncates the
    fractional part rather than rounding it; replicated exactly for score
    parity.
    """
    multiplier = 10.0 ** float(precision)
    fl = math.floor(value)
    return fl + math.floor((value - fl) * multiplier) / multiplier


def get_random_id(start_id: int, end_exclusive: int) -> int:
    """Host-side uniform id draw (`math_utils.rs:14-16`)."""
    import random

    return random.randrange(start_id, end_exclusive)


def choice(objects, n: int, replace: bool):
    """Host-side sampling with/without replacement (`math_utils.rs:18-47`)."""
    import random

    if replace:
        return [random.choice(objects) for _ in range(n)]
    if n > len(objects):
        raise ValueError(
            "There are less objects than can be chosen without replacement"
        )
    return random.sample(list(objects), n)


def round_decimal_jnp(value, precision):
    """Vectorized `round_decimal`; `precision` must be static (a Python int
    or concrete array) — the multiplier is computed on host because device
    `pow` is approximate and would break bit-parity."""
    import numpy as np

    p = np.asarray(precision)
    multiplier = jnp.asarray((10.0 ** p.astype(np.int64)).astype(np.float64))
    fl = jnp.floor(value)
    return fl + jnp.floor((value - fl) * multiplier) / multiplier
