"""Hardware (Mosaic-compiled) coverage for the fused Pallas VRP delta
scorer — the suite interpret-mode parity cannot stand in for.

Round 2's kernel passed interpret-mode parity and then OOMed the 16MB
scoped-VMEM stack on the real chip at bench geometry (BENCH_r02.json); two
hardware-only Mosaic workarounds already live in delta_pallas.py. This
suite compiles the kernel through Mosaic and asserts parity with the XLA
delta path at three geometries INCLUDING the bench one (n=1000, K=40,
time-windowed, P=2048, vmapped over 8 islands — the exact shape that
crashed round 2).

Run with: GJ_TESTS_TPU=1 python -m pytest tests/test_delta_pallas_tpu.py
(skipped entirely on non-TPU backends; conftest.py forces CPU otherwise).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware Pallas suite: requires a real TPU backend "
    "(set GJ_TESTS_TPU=1 so conftest does not force CPU)",
)

from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance  # noqa: E402
from greyjack_tpu.models.vrp import delta_pallas  # noqa: E402
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester  # noqa: E402
from greyjack_tpu.ops import moves  # noqa: E402


def _parity_on_hw(n, d, kveh, tw, p, n_islands=1, seed=7):
    domain = generate_instance(n, d, kveh, seed=seed, time_windowed=tw)
    cotwin = CotwinBuilder(True, tw).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, 0.2, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0])
    tabu = cfg.init_tabu_state()
    utils = req._delta_utils()

    key = jax.random.key(seed)
    base = vm.sample_variables(key, 1)[0]
    ctx = req.build_base_ctx(base)

    def neighbourhood(k):
        deltas, _ = moves.move_population_delta(k, base, p, vm, cfg, tabu)
        return deltas

    calc = req.cotwin.score_calculator

    if n_islands > 1:
        # the bench shape: the kernel vmapped over the island axis — this is
        # where round 2's per-program VMEM overflow surfaced
        keys = jax.random.split(jax.random.fold_in(key, 1), n_islands)
        deltas = jax.vmap(neighbourhood)(keys)
        ctxs = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_islands,) + x.shape), ctx)
        got_fn = jax.jit(jax.vmap(
            lambda c, ds: delta_pallas.score_delta_batch(c, ds, utils)))
        want_fn = jax.jit(jax.vmap(jax.vmap(
            lambda c, dd: calc.delta_score_fn(c, dd, utils),
            in_axes=(None, 0)), in_axes=(0, 0)))
        got = got_fn(ctxs, deltas)
        want = want_fn(ctxs, deltas)
    else:
        deltas = neighbourhood(jax.random.fold_in(key, 1))
        got_fn = jax.jit(
            lambda c, ds: delta_pallas.score_delta_batch(c, ds, utils))
        want_fn = jax.jit(jax.vmap(
            lambda dd: calc.delta_score_fn(ctx, dd, utils)))
        got = got_fn(ctx, deltas)
        want = want_fn(deltas)
    assert got is not None, "kernel unexpectedly ineligible"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hw_small_tw():
    _parity_on_hw(n=40, d=2, kveh=6, tw=True, p=128)


def test_hw_small_notw():
    _parity_on_hw(n=40, d=2, kveh=6, tw=False, p=128)


def test_hw_bench_geometry():
    # the exact round-2 crash shape: n=1000/d=8/K=40, tw, P=2048, 8 islands
    _parity_on_hw(n=1000, d=8, kveh=40, tw=True, p=2048, n_islands=8)


def test_hw_pallas_under_shard_map():
    """Mosaic kernel traced + executed INSIDE jax.shard_map (1-device mesh
    on the single available chip — the composition, not the scale, is what
    breaks: VERDICT r4 item 6, shard_map x pallas_call is where surprises
    live). Parity against the XLA delta path through the same mesh."""
    from jax.sharding import Mesh, PartitionSpec as P

    domain = generate_instance(96, 2, 8, seed=7, time_windowed=True)
    cotwin = CotwinBuilder(True, True).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, 0.2, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0])
    tabu = cfg.init_tabu_state()
    utils = req._delta_utils()
    calc = req.cotwin.score_calculator

    base = vm.sample_variables(jax.random.key(3), 1)[0]
    ctx = req.build_base_ctx(base)
    deltas, _ = moves.move_population_delta(
        jax.random.key(4), base, 256, vm, cfg, tabu)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("islands",))

    def block(ds):
        out = delta_pallas.score_delta_batch(ctx, ds, utils)
        assert out is not None, "kernel unexpectedly ineligible"
        return out

    # check_vma=False as in the production mesh path (parallel/islands.py):
    # pallas_call's out_shapes carry no `vma`, so shard_map's default
    # varying-across-mesh check rejects ANY pallas_call inside shard_map —
    # exactly the composition surprise this test exists to pin
    got = jax.jit(jax.shard_map(
        block, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), deltas),),
        out_specs=P(),
        check_vma=False,
    ))(deltas)
    want = jax.jit(jax.vmap(
        lambda dd: calc.delta_score_fn(ctx, dd, utils)))(deltas)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
