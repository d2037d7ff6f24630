"""TSP sweep scorer parity vs the plain (golden-tested) scorer.

Every TSP sweep delta is EXACT (no time windows) — equality is asserted
for all valid candidates in both families.
"""

import numpy as np
import jax
import jax.numpy as jnp

from greyjack_tpu.models.tsp import (CotwinBuilder, sweep,
                                     generate_uniform_instance)
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
from greyjack_tpu.ops import moves


def _build(n=30, seed=3):
    domain = generate_uniform_instance(n, seed=seed)
    cotwin = CotwinBuilder(True, True).build_cotwin(domain, False)
    return ScoreRequester(cotwin)


def _ints(scores, base):
    d = np.asarray(scores, np.float64) - np.asarray(base, np.float64)
    return np.stack([d[..., 0], np.rint(d[..., 1] * 1000.0)],
                    axis=-1).astype(np.int64)


def _perturbed_base(req, seed=7, n_moves=10):
    vm = req.variables_manager
    base = np.asarray(vm.sample_variables(jax.random.key(0), 1)[0]).copy()
    rng = np.random.RandomState(seed)
    n = len(base)
    for _ in range(n_moves):
        i, j = rng.randint(n), rng.randint(n)
        base[i], base[j] = base[j], base[i]
        # inject a duplicate occasionally (infeasible states covered)
        if rng.rand() < 0.3:
            base[rng.randint(n)] = base[rng.randint(n)]
    return jnp.asarray(base, vm.float_dtype)


def test_tsp_sweep_family_parity():
    req = _build()
    utils = req._delta_utils()
    assert req.supports_sweep
    cfg = sweep.SweepConfig(req, targets=req.variables_manager.variables_count)
    n = cfg.n_rows
    l = utils["n_locations"]

    base = _perturbed_base(req)
    ctx = req.build_base_ctx(base)
    base_score = np.asarray(req.request_score_plain(base[None, :])[0])

    t_rows = jnp.arange(n, dtype=jnp.int32)
    sc = jax.jit(lambda c: sweep.score_candidates(
        c, t_rows, jnp.ones((n,), bool), jnp.zeros((n,), bool), cfg,
        utils))(ctx)
    sc = jax.tree.map(np.asarray, sc)
    base_np = np.asarray(base)

    def batch(rows):
        pops = jnp.asarray(np.stack(rows), base.dtype)
        return _ints(np.asarray(req.request_score_plain(pops)), base_score)

    rng = np.random.RandomState(1)
    # family A: change
    pairs = [(t, c) for t in rng.choice(n, 8, replace=False)
             for c in range(l - 1)]
    rows = []
    for t, c in pairs:
        m = base_np.copy()
        m[t] = 1 + c
        rows.append(m)
    oracle = batch(rows)
    checked = 0
    for (t, c), orc in zip(pairs, oracle):
        if not sc["a_valid"][t, c]:
            continue
        got = (sc["a_hard"][t, c], sc["a_dist"][t, c])
        assert tuple(got) == tuple(orc), (t, c, got, orc)
        checked += 1
    assert checked > 100

    # family C: swap (includes adjacent pairs)
    pairs = [(t, j) for t in list(rng.choice(n, 6, replace=False)) + [4, 5]
             for j in range(n)]
    rows = []
    for t, j in pairs:
        m = base_np.copy()
        m[t], m[j] = m[j], m[t]
        rows.append(m)
    oracle = batch(rows)
    adj_checked = 0
    for (t, j), orc in zip(pairs, oracle):
        if not sc["c_valid"][t, j]:
            continue
        got = (sc["c_hard"][t, j], sc["c_dist"][t, j])
        assert tuple(got) == tuple(orc), (t, j, got, orc)
        if abs(t - j) == 1:
            adj_checked += 1
    assert adj_checked > 0


def test_tsp_sweep_island_run_improves():
    from greyjack_tpu.agents import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit
    from greyjack_tpu.parallel import IslandRunner

    req = _build(n=40, seed=11)
    agent = TabuSearch(64, 0.2, True, None, [0.5, 0.5, 0, 0, 0, 0], 5,
                       StepsLimit(100), sweep=True, sweep_targets=8)
    kernel = agent.build_kernel(req, None)
    runner = IslandRunner(kernel, n_islands=2, migration_frequency=5)
    state = runner.init(jax.random.key(1))
    init = np.asarray(state["islands"]["scores"])[0, 0]
    alive = jnp.ones((2,), bool)
    for i in range(6):
        state = runner.run_chunk(state, jax.random.key(50 + i), alive, {}, 5)
    g = np.asarray(state["global_score"])
    recomputed = np.asarray(req.request_score_plain(
        state["global_values"][None, :])[0])
    np.testing.assert_allclose(g, recomputed, rtol=0, atol=1e-9)
    assert tuple(g) <= tuple(init)
    assert int(np.asarray(state["islands"]["sweep_scored"]).sum()) > 0


def test_tsp_sweep_reversal_insertion_parity():
    req = _build()
    utils = req._delta_utils()
    cfg = sweep.SweepConfig(req, targets=req.variables_manager.variables_count)
    n = cfg.n_rows

    base = _perturbed_base(req)
    ctx = req.build_base_ctx(base)
    base_score = np.asarray(req.request_score_plain(base[None, :])[0])
    t_rows = jnp.arange(n, dtype=jnp.int32)
    sc = jax.jit(lambda c: sweep.score_candidates(
        c, t_rows, jnp.ones((n,), bool), jnp.zeros((n,), bool), cfg,
        utils))(ctx)
    sc = jax.tree.map(np.asarray, sc)
    base_np = np.asarray(base)

    def batch(rows):
        pops = jnp.asarray(np.stack(rows), base.dtype)
        return _ints(np.asarray(req.request_score_plain(pops)), base_score)

    rng = np.random.RandomState(2)
    # reversal: reverse [min, max]
    pairs = [(t, j) for t in rng.choice(n, 6, replace=False)
             for j in range(n)]
    rows = []
    for t, j in pairs:
        m = base_np.copy()
        a, b = min(t, j), max(t, j)
        m[a:b + 1] = m[a:b + 1][::-1]
        rows.append(m)
    oracle = batch(rows)
    rc = 0
    for (t, j), orc in zip(pairs, oracle):
        if not sc["r_valid"][t, j]:
            continue
        got = (sc["r_hard"][t, j], sc["r_dist"][t, j])
        assert tuple(got) == tuple(orc), ("rev", t, j, got, orc)
        rc += 1
    assert rc > 50

    # insertion: move city at t to sit after position j
    pairs = [(t, j) for t in rng.choice(n, 6, replace=False)
             for j in range(n)]
    rows = []
    for t, j in pairs:
        m = list(base_np.copy())
        city = m.pop(t)
        # after removal, "after original j" target index shifts for j > t
        m.insert(j if j > t else j + 1, city)
        rows.append(np.asarray(m))
    oracle = batch(rows)
    ic = 0
    for (t, j), orc in zip(pairs, oracle):
        if not sc["i_valid"][t, j]:
            continue
        got = (sc["i_hard"][t, j], sc["i_dist"][t, j])
        assert tuple(got) == tuple(orc), ("ins", t, j, got, orc)
        ic += 1
    assert ic > 50


def test_tsp_sweep_winner_decode_exact():
    """The width-_KD winner delta must reproduce the winning candidate's
    sweep score exactly for every family (checked across many keys)."""
    req = _build(n=40, seed=19)
    utils = req._delta_utils()
    cfg = sweep.SweepConfig(req, targets=10)
    mcfg = moves.MoverConfig(req.variables_manager, tabu_entity_rate=0.2,
                             move_probas=[0.5, 0.5, 0, 0, 0, 0])
    tabu = mcfg.init_tabu_state()
    base = _perturbed_base(req, seed=23)
    ctx = req.build_base_ctx(base)
    base_score = np.asarray(req.request_score_plain(base[None, :])[0])
    free = mcfg.tabu_free(tabu)
    masks = mcfg.tabu_masks(tabu)
    fn = jax.jit(lambda k, c: sweep.propose(k, c, free, masks, cfg, utils))
    for i in range(8):
        delta, exact, info, stats = fn(jax.random.key(i), ctx)
        mut = moves.apply_delta(base, jax.tree.map(lambda x: x, delta))
        orc = _ints(np.asarray(req.request_score_plain(mut[None, :])[0]),
                    base_score)
        assert tuple(np.asarray(exact)) == tuple(orc), (i, exact, orc)
        # push the winner so later keys see different tabu targets
        tabu = moves.update_tabu_from_info(
            tabu, jax.tree.map(lambda x: x[None], info), 0)
        free = mcfg.tabu_free(tabu)
        masks = mcfg.tabu_masks(tabu)
        fn = jax.jit(lambda k, c, f=free, m=masks: sweep.propose(
            k, c, f, m, cfg, utils))
