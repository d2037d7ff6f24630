"""Mesh construction helpers for the island axis.

The reference scales by spawning `n_jobs` OS threads over a crossbeam ring
(`solver/solver.rs:85-143`). The TPU equivalent is a 1-D device mesh whose
`islands` axis carries island shards; migration rides `lax.ppermute` over
ICI and the global best is a lexicographic all-reduce (SURVEY.md §2.3).
"""

import jax
from jax.sharding import Mesh


def make_island_mesh(devices=None):
    """1-D mesh over all (or given) devices with axis name 'islands'."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), ("islands",))
