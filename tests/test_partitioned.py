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


def _islands_facts_mesh(n_islands, n_facts):
    devs = np.array(jax.devices()[: n_islands * n_facts]).reshape(
        n_islands, n_facts)
    return Mesh(devs, ("islands", "facts"))


def test_partitioned_plain_vrp_scores_bit_identical():
    """VERDICT r4 item 4: the `ScoreRequester` partitioned mode — dm
    row-sharded over the facts axis of an (islands, facts) mesh — must
    reproduce replicated plain scoring bit for bit."""
    from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester

    n_islands, n_facts = 2, 4
    mesh = _islands_facts_mesh(n_islands, n_facts)
    domain = generate_instance(30, 2, 6, seed=4, time_windowed=True)
    req = ScoreRequester(CotwinBuilder(True, True).build_cotwin(domain, False))
    fn = req.partitioned_plain_score_fn("facts")

    dm_milli = req.cotwin.score_calculator.utility_objects[
        "distance_matrix_milli"]
    dm_flat, _r = partitioned.shard_rows_flat(dm_milli, n_facts)

    p = 8
    pop = req.variables_manager.sample_variables(
        jax.random.key(3), n_islands * p)
    pop_blk = pop.reshape(n_islands, p, -1)

    def block(dm_shard, pop_island):
        return fn(dm_shard, pop_island[0])[None]

    out = jax.jit(jax.shard_map(
        block, mesh=mesh,
        in_specs=(P("facts"), P("islands", None, None)),
        out_specs=P("islands", None, None),
    ))(dm_flat, pop_blk)

    # each facts-device holds only its row block of the flat dm
    shard_shapes = {s.data.shape for s in jax.device_put(
        dm_flat, NamedSharding(mesh, P("facts"))).addressable_shards}
    assert shard_shapes == {(dm_flat.shape[0] // n_facts,)}

    expect = req.request_score_plain(pop).reshape(n_islands, p, -1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_partitioned_plain_tsp_scores_bit_identical():
    from greyjack_tpu.models.tsp import (CotwinBuilder,
                                         generate_uniform_instance)
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester

    n_islands, n_facts = 4, 2
    mesh = _islands_facts_mesh(n_islands, n_facts)
    domain = generate_uniform_instance(25, seed=6)
    req = ScoreRequester(CotwinBuilder(True, True).build_cotwin(domain, False))
    fn = req.partitioned_plain_score_fn("facts")
    dm_milli = req.cotwin.score_calculator.utility_objects[
        "distance_matrix_milli"]
    dm_flat, _r = partitioned.shard_rows_flat(dm_milli, n_facts)

    p = 4
    pop = req.variables_manager.sample_variables(
        jax.random.key(9), n_islands * p)
    pop_blk = pop.reshape(n_islands, p, -1)

    def block(dm_shard, pop_island):
        return fn(dm_shard, pop_island[0])[None]

    out = jax.jit(jax.shard_map(
        block, mesh=mesh,
        in_specs=(P("facts"), P("islands", None, None)),
        out_specs=P("islands", None, None),
    ))(dm_flat, pop_blk)
    expect = req.request_score_plain(pop).reshape(n_islands, p, -1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))
