"""Variable descriptor + VariablesManager tests (reference inline tests at
`gj_integer.rs:137-182`, `gj_float.rs:167-195`; semantic groups at
`variables_manager.rs:76-106`)."""

import jax
import numpy as np
import pytest

from greyjack_tpu.variables import GJFloat, GJInteger
from greyjack_tpu.score_calculation.score_requesters import VariablesManager


def test_frozen_initial():
    x = GJInteger(1, -1, 1, True, None)
    assert x.get_initial_value() == 1.0


def test_fix_clamps():
    x = GJInteger(1, -1, 1, False, None)
    assert x.fix(-100.0) == -1.0
    assert x.fix(100.0) == 1.0
    f = GJFloat(1.0, -1.0, 1.0, False, None)
    assert f.fix(-100.0) == -1.0
    assert f.fix(100.0) == 1.0


def test_inverse_transform_rounding():
    x = GJInteger(1, -10, 10, False, None)
    assert x.inverse_transform(4.4) == 4
    assert x.inverse_transform(4.6) == 5


def test_frozen_requires_initial():
    with pytest.raises(ValueError):
        GJInteger(None, 0, 5, True, None)


def test_default_semantic_group():
    x = GJInteger(None, 0, 5, False, None)
    assert x.semantic_groups == ["common"]


def test_manager_semantic_groups_skip_frozen():
    vs = [
        GJInteger(0, 0, 9, False, ["a", "common"]),
        GJInteger(1, 0, 9, True, ["a", "common"]),  # frozen: excluded
        GJFloat(None, 0.0, 1.0, False, ["b"]),
    ]
    vm = VariablesManager(vs)
    assert vm.semantic_groups_map["a"] == [0]
    assert vm.semantic_groups_map["common"] == [0]
    assert vm.semantic_groups_map["b"] == [2]
    assert vm.discrete_ids == [0, 1]


def test_manager_fix_all_and_sampling():
    vs = [
        GJInteger(None, 0, 9, False, None),
        GJFloat(None, -1.0, 1.0, False, None),
        GJInteger(5, 0, 9, True, None),
    ]
    vm = VariablesManager(vs)
    pop = vm.sample_variables(jax.random.key(0), 64)
    arr = np.asarray(pop)
    assert arr.shape == (64, 3)
    assert ((arr[:, 0] >= 0) & (arr[:, 0] <= 9)).all()
    assert (arr[:, 0] == np.round(arr[:, 0])).all()
    assert ((arr[:, 1] >= -1.0) & (arr[:, 1] <= 1.0)).all()
    assert (arr[:, 2] == 5.0).all()

    wild = np.array([[100.0, -7.0, 0.0], [3.4, 0.5, 1.0]])
    fixed = np.asarray(vm.fix_all(wild))
    np.testing.assert_array_equal(fixed[0], [9.0, -1.0, 5.0])
    np.testing.assert_array_equal(fixed[1], [3.0, 0.5, 5.0])
