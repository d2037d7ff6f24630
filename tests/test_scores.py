"""Score-class parity tests, mirroring the reference inline tests
(`simple_score.rs:120-172`, `hard_soft_score.rs:124-183`)."""

import pytest

from greyjack_tpu.score_calculation.scores import (
    SimpleScore,
    HardSoftScore,
    HardMediumSoftScore,
)


def test_simple_score_impl():
    assert SimpleScore(-1.0).get_sum_abs() == 1.0
    s = SimpleScore(9.0)
    assert s.get_priority_score() == 9.0
    assert s.get_fitness_value() == 0.9


def test_simple_score_comparison():
    small, null, large = SimpleScore(-10.0), SimpleScore(0.0), SimpleScore(10.0)
    assert small < large and small <= large and small != large
    assert null == SimpleScore(0.0)
    assert large > null and large >= large
    scores = [SimpleScore(float(i)) for i in range(10)]
    assert sorted(reversed(scores)) == scores


def test_simple_score_add():
    s1 = SimpleScore(-1.0)
    assert s1 + SimpleScore(1.0) == SimpleScore(0.0)
    s1 += SimpleScore(1.0)
    assert s1 == SimpleScore(0.0)


def test_hard_soft_impl():
    assert HardSoftScore(-1.0, -1.0).get_sum_abs() == 2.0
    s = HardSoftScore(0.0, 9.0)
    assert s.get_priority_score() == 9.0
    assert s.get_fitness_value() == 0.45


def test_hard_soft_lexicographic():
    small = HardSoftScore(-1.0, -1.0)
    null = HardSoftScore(0.0, 0.0)
    large = HardSoftScore(0.0, 0.1)
    assert small < large and null < large
    # hard dominates soft regardless of magnitude
    assert HardSoftScore(1.0, 0.0) > HardSoftScore(0.0, 1e9)
    scores = [HardSoftScore(float(i), float(2 * i)) for i in range(10)]
    assert sorted(reversed(scores)) == scores


def test_hard_medium_soft_lexicographic():
    a = HardMediumSoftScore(0.0, 0.0, 5.0)
    b = HardMediumSoftScore(0.0, 1.0, 0.0)
    c = HardMediumSoftScore(1.0, 0.0, 0.0)
    assert a < b < c
    assert HardMediumSoftScore(0.0, 0.0, 0.0).get_priority_score() == 0.0
    assert HardMediumSoftScore(2.0, 1.0, 0.5).get_priority_score() == 2.0
    assert HardMediumSoftScore(0.0, 1.0, 0.5).get_priority_score() == 1.0


def test_round_precision():
    s = HardSoftScore(1.23456, 7.89123)
    s.round([3, 3])
    assert s.hard_score == 1.234
    assert s.soft_score == 7.891


def test_stub_and_null():
    stub = HardSoftScore.get_stub_score()
    assert HardSoftScore(1e300, 1e300) < stub
    assert HardSoftScore.get_null_score() == HardSoftScore(0.0, 0.0)


def test_mul_and_json_roundtrip():
    s = HardMediumSoftScore(1.0, 2.0, 3.0).mul(2.0)
    assert s.values == [2.0, 4.0, 6.0]
    j = s.to_json()
    assert HardMediumSoftScore.from_json(j) == s
