"""Move-kernel property tests (SURVEY.md §4(b)): permutation moves preserve
the value multiset, change moves stay in bounds, frozen variables are never
touched, and each move family actually fires."""

import jax
import numpy as np

from greyjack_tpu.variables import GJInteger, GJFloat
from greyjack_tpu.score_calculation.score_requesters import VariablesManager
from greyjack_tpu.ops import moves


def _vm(n=16):
    return VariablesManager([GJInteger(i, 0, n - 1) for i in range(n)])


def _pop(vm, p=32, seed=0):
    return vm.sample_variables(jax.random.key(seed), p)


def _run_move(move_idx, vm, pop, seed=1, tabu_rate=0.0):
    probas = [0.0] * 6
    probas[move_idx] = 1.0
    cfg = moves.MoverConfig(vm, tabu_rate, None, probas)
    ts = cfg.init_tabu_state()
    new, info = moves.move_population(jax.random.key(seed), pop, vm, cfg, ts)
    return np.asarray(new), info


PERMUTATION_MOVES = [1, 2, 3, 4, 5]  # swap, swap_edges, scramble, insertion, inverse


def test_permutation_moves_preserve_multiset():
    vm = _vm()
    pop = _pop(vm)
    for m in PERMUTATION_MOVES:
        new, _ = _run_move(m, vm, pop, seed=m + 10)
        old = np.asarray(pop)
        for i in range(old.shape[0]):
            assert sorted(new[i]) == sorted(old[i]), f"move {m}, candidate {i}"


def test_moves_change_something():
    vm = _vm()
    pop = _pop(vm)
    for m in range(6):
        new, _ = _run_move(m, vm, pop, seed=m + 20)
        assert (new != np.asarray(pop)).any(), f"move {m} was a global no-op"


def test_change_move_in_bounds():
    vm = _vm()
    pop = _pop(vm)
    new, _ = _run_move(0, vm, pop, seed=3)
    assert (new >= 0).all() and (new <= 15).all()
    # change resamples: values need not be a permutation but must be ints
    # after fix
    fixed = np.asarray(vm.fix_all(new))
    assert (fixed == np.round(fixed)).all()


def test_frozen_variables_never_move():
    n = 12
    vs = [GJInteger(i, 0, n - 1, frozen=(i % 3 == 0)) for i in range(n)]
    vm = VariablesManager(vs)
    pop = vm.sample_variables(jax.random.key(5), 64)
    frozen_cols = [i for i in range(n) if i % 3 == 0]
    for m in range(6):
        new, _ = _run_move(m, vm, pop, seed=m)
        new = np.asarray(vm.fix_all(new))
        for c in frozen_cols:
            assert (new[:, c] == float(c)).all(), f"move {m} touched frozen col {c}"


def test_tabu_state_updates():
    vm = _vm()
    pop = _pop(vm, p=8)
    cfg = moves.MoverConfig(vm, 0.5, None, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    ts = cfg.init_tabu_state()
    _, info = moves.move_population(jax.random.key(9), pop, vm, cfg, ts)
    ts2 = moves.update_tabu_from_info(ts, info, 0)
    assert int(ts2["cursor"][int(info["group"][0])]) > 0


def test_tabu_push_multi_group():
    # regression: the compare-select tabu_push must address the right ring
    # row when G > 1 (a G=1 ring broadcasts by accident)
    from greyjack_tpu.ops import selection

    ts = selection.make_tabu_state(3, 8)
    pos = np.array([4, 7], np.int32)
    ts2 = selection.tabu_push(ts, 2, pos, 2)
    ring = np.asarray(ts2["ring"])
    assert ring[2, 0] == 4 and ring[2, 1] == 7
    assert (ring[0] == -1).all() and (ring[1] == -1).all()
    assert int(ts2["cursor"][2]) == 2 and int(ts2["cursor"][0]) == 0
    # eviction wraps the cursor
    for s in range(5):
        ts2 = selection.tabu_push(ts2, 2, pos + s, 2)
    assert int(ts2["cursor"][2]) == (2 + 10) % 8
    # free-list view excludes pushed (recent) slots
    vs = [GJInteger(i, 0, 9, semantic_groups=["g1"]) for i in range(8)] + [
        GJInteger(i, 0, 9, semantic_groups=["g2"]) for i in range(8)
    ]
    vm2 = VariablesManager(vs)
    cfg2 = moves.MoverConfig(vm2, 0.5, None, [0.5, 0.5, 0, 0, 0, 0])
    tsf = cfg2.init_tabu_state()
    tsf = selection.tabu_push(tsf, 1, np.array([3, 5], np.int32), 2)
    fl, fc = cfg2.tabu_free(tsf)
    fl, fc = np.asarray(fl), np.asarray(fc)
    assert fc[0] == 8 and fc[1] == 6
    assert 3 not in fl[1, :fc[1]] and 5 not in fl[1, :fc[1]]
    assert sorted(fl[1, :fc[1]].tolist()) == [0, 1, 2, 4, 6, 7]


def test_multi_group_moves_stay_within_group():
    # two semantic groups over disjoint variable ranges: a move must only
    # touch one group's slots
    vs = [GJInteger(i, 0, 9, semantic_groups=["g1"]) for i in range(8)] + [
        GJInteger(i, 0, 9, semantic_groups=["g2"]) for i in range(8)
    ]
    vm = VariablesManager(vs)
    pop = vm.sample_variables(jax.random.key(11), 32)
    for m in PERMUTATION_MOVES:
        new, info = _run_move(m, vm, pop, seed=40 + m)
        old = np.asarray(pop)
        for i in range(32):
            touched = np.nonzero(new[i] != old[i])[0]
            if len(touched):
                assert (touched < 8).all() or (touched >= 8).all(), (
                    f"move {m} crossed groups: {touched}"
                )


def test_apply_delta_wide_matches_unrolled():
    """The wide (matrix) apply_delta path must keep exact `.at[].set`
    semantics — later rows win position collisions, invalid rows are
    ignored — and agree with the narrow unrolled path on every width."""
    import jax.numpy as jnp
    import numpy as np

    from greyjack_tpu.ops import moves

    rng = np.random.RandomState(5)
    v = 37
    base = jnp.asarray(rng.uniform(0, 10, size=v))

    def oracle(delta):
        out = np.asarray(base).copy()
        for p, val, ok in zip(np.asarray(delta["positions"]),
                              np.asarray(delta["values"]),
                              np.asarray(delta["valid"])):
            if ok:
                out[p] = val
        return out

    for kd in (1, 2, 8, 9, 33, 64):
        pos = rng.randint(0, v, size=kd).astype(np.int32)
        # force collisions: half the rows hit the same position
        pos[kd // 2:] = pos[: kd - kd // 2]
        delta = {
            "positions": jnp.asarray(pos),
            "values": jnp.asarray(rng.uniform(0, 10, size=kd)),
            "valid": jnp.asarray(rng.rand(kd) < 0.7),
        }
        got = np.asarray(moves.apply_delta(base, delta))
        np.testing.assert_array_equal(got, oracle(delta), err_msg=f"kd={kd}")
