"""Bit-parity of the fused Pallas VRP delta scorer vs the XLA path.

Runs the Pallas kernel in interpreter mode on CPU (GJ_PALLAS_INTERPRET set
per-call via env) and asserts exact equality with vmapped `score_delta` on
real sampler-generated neighbourhoods — vehicle moves, customer changes,
swaps, including same-route adjacent edits (the dirty-pair dedupe case).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greyjack_tpu.models.vrp import CotwinBuilder, generate_instance
from greyjack_tpu.models.vrp import delta_pallas
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
from greyjack_tpu.ops import moves


@pytest.fixture(autouse=True)
def _interp_env(monkeypatch):
    monkeypatch.setenv("GJ_PALLAS_INTERPRET", "1")


def _setup(tw, n=40, d=2, kveh=6, seed=3):
    domain = generate_instance(n, d, kveh, seed=seed, time_windowed=tw)
    cotwin = CotwinBuilder(True, False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    return req


def _parity_case(req, probas, seed, p=128):
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, 0.2, None, probas)
    assert cfg.delta_width <= 2, "parity cases must be narrow-delta configs"
    tabu = cfg.init_tabu_state()
    key = jax.random.key(seed)
    base = vm.sample_variables(key, 1)[0]
    ctx = req.build_base_ctx(base)
    deltas, _ = moves.move_population_delta(
        jax.random.fold_in(key, 1), base, p, vm, cfg, tabu)

    utils = req._delta_utils()
    got = delta_pallas.score_delta_batch(ctx, deltas, utils)
    assert got is not None, "kernel unexpectedly ineligible"

    calc = req.cotwin.score_calculator
    want = jax.vmap(lambda d: calc.delta_score_fn(ctx, d, utils))(deltas)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("tw", [True, False])
def test_parity_change_swap(tw):
    req = _setup(tw)
    _parity_case(req, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0], seed=11)


def test_parity_change_only_tw():
    req = _setup(True)
    _parity_case(req, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0], seed=23)


def test_parity_swap_only_tw():
    # swaps on the common group mix vehicle and customer vars, producing
    # same-route adjacent customer swaps (dirty-pair dedupe) and two-row
    # vehicle moves
    req = _setup(True)
    _parity_case(req, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0], seed=37)


def test_parity_after_updates():
    # ctx advanced by a few accepted deltas must still score bit-equal
    req = _setup(True)
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, 0.2, None, [0.5, 0.5, 0, 0, 0, 0])
    tabu = cfg.init_tabu_state()
    key = jax.random.key(5)
    base = vm.sample_variables(key, 1)[0]
    ctx = req.build_base_ctx(base)
    for i in range(3):
        d, _ = moves.move_population_delta(
            jax.random.fold_in(key, i), base, 1, vm, cfg, tabu)
        w = jax.tree.map(lambda x: x[0], d)
        base = moves.apply_delta(base, w)
        ctx = req.update_ctx(ctx, w)
    deltas, _ = moves.move_population_delta(
        jax.random.fold_in(key, 99), base, 128, vm, cfg, tabu)
    utils = req._delta_utils()
    got = delta_pallas.score_delta_batch(ctx, deltas, utils)
    calc = req.cotwin.score_calculator
    want = jax.vmap(lambda d: calc.delta_score_fn(ctx, d, utils))(deltas)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int_rows_order_equivalent():
    """i32 delta rows must induce EXACTLY the f64 rows' lexicographic order
    and the same accept decision (<= base score <=> <= 0) — the TS int fast
    path replaces f64 argmin/accept with them."""
    req = _setup(True)
    vm = req.variables_manager
    cfg = moves.MoverConfig(vm, 0.2, None, [0.5, 0.5, 0, 0, 0, 0])
    key = jax.random.key(41)
    base = vm.sample_variables(key, 1)[0]
    ctx = req.build_base_ctx(base)
    deltas, _ = moves.move_population_delta(
        jax.random.fold_in(key, 1), base, 128, vm, cfg,
        cfg.init_tabu_state())
    utils = req._delta_utils()
    f64 = delta_pallas.score_delta_batch(ctx, deltas, utils)
    ints = delta_pallas.score_delta_batch_ints(ctx, deltas, utils)
    assert ints is not None and ints.dtype == jnp.int32

    from greyjack_tpu.ops import lexico
    lt_f = np.asarray(lexico.lex_less(f64[:, None, :], f64[None, :, :]))
    lt_i = np.asarray(lexico.lex_less(ints[:, None, :], ints[None, :, :]))
    np.testing.assert_array_equal(lt_f, lt_i)
    assert int(lexico.lex_argmin(f64)) == int(lexico.lex_argmin(ints))

    base_score = req.ctx_score_row(ctx)
    acc_f = np.asarray(lexico.lex_leq(f64, base_score[None, :]))
    acc_i = np.asarray(lexico.lex_leq(
        ints, jnp.zeros((1, ints.shape[-1]), ints.dtype)))
    np.testing.assert_array_equal(acc_f, acc_i)
    # base candidate's own score materializes exactly from ctx sums
    calc = req.cotwin.score_calculator
    noop = {"positions": jnp.zeros((2,), jnp.int32),
            "values": jnp.zeros((2,)), "valid": jnp.zeros((2,), bool)}
    want = calc.delta_score_fn(ctx, noop, utils)
    np.testing.assert_array_equal(np.asarray(base_score), np.asarray(want))


def test_ineligible_falls_back():
    req = _setup(True)
    vm = req.variables_manager
    # wide move set -> KD > 2 -> ineligible
    cfg = moves.MoverConfig(vm, 0.2, None, [0.2, 0.2, 0.2, 0.2, 0.1, 0.1])
    key = jax.random.key(0)
    base = vm.sample_variables(key, 1)[0]
    ctx = req.build_base_ctx(base)
    deltas, _ = moves.move_population_delta(
        key, base, 128, vm, cfg, cfg.init_tabu_state())
    assert delta_pallas.score_delta_batch(ctx, deltas,
                                          req._delta_utils()) is None
    # requester still scores through the fallback
    scores = req.request_score_delta(ctx, deltas)
    assert scores.shape == (128, 3)
