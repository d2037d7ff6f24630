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


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host bring-up: `jax.distributed.initialize` + a global island
    mesh over every chip in the slice/pod.

    Replaces the reference's single-process rayon fan-out
    (`solver/solver.rs:94-143`) for multi-host runs: migration then rides
    ICI within a slice and DCN across slices through the same `ppermute`
    ring (the mesh orders devices so neighboring islands are ICI-adjacent).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return make_island_mesh()
