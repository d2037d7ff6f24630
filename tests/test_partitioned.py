"""Row-sharded fact-table gather over a (islands, facts) mesh.

DESIGN.md §6 prototype (VERDICT r3 item 8): the distance matrix lives
`P('facts', None)` — each device holds only its row block — and per-step
dm lookups are an owner-computes + psum exchange that reproduces the dense
gather exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from greyjack_tpu.ops import partitioned


@pytest.mark.parametrize("n_facts", [2, 4])
def test_sharded_dm_gather_matches_dense(n_facts):
    devs = np.array(jax.devices()[:2 * n_facts]).reshape(2, n_facts)
    mesh = Mesh(devs, ("islands", "facts"))
    l = 37  # deliberately not divisible by the shard count
    rng = np.random.RandomState(0)
    dm = jnp.asarray(rng.randint(0, 1 << 20, size=(l, l)), jnp.int32)
    dm_pad, r = partitioned.shard_rows(dm, n_facts)

    p = 64
    u = jnp.asarray(rng.randint(0, l, size=(2, p)), jnp.int32)  # per island
    v = jnp.asarray(rng.randint(0, l, size=(2, p)), jnp.int32)

    def step(dm_shard, u_blk, v_blk):
        return partitioned.sharded_dm_gather(dm_shard, u_blk[0], v_blk[0],
                                             "facts")[None]

    out = jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("facts", None), P("islands", None), P("islands", None)),
        out_specs=P("islands", None),
    ))(dm_pad, u, v)

    # each device holds only rows_per_shard rows
    assert r == -(-l // n_facts)
    shard_shapes = {s.data.shape for s in
                    jax.device_put(dm_pad, NamedSharding(
                        mesh, P("facts", None))).addressable_shards}
    assert shard_shapes == {(r, l)}

    expect = np.asarray(dm)[np.asarray(u), np.asarray(v)]
    np.testing.assert_array_equal(np.asarray(out), expect)
