"""Progressive-growth schedule arithmetic (reference plugins.py:57-63) and
LR ramp (train.py:151-156) — property tests per SURVEY.md §4."""

import math

import pytest

from pggan_tpu.training.schedule import (
    depth_alpha_schedule,
    lod_value,
    lr_rampup,
    minibatch_for_depth,
    tick_kimg_for_depth,
)


def test_schedule_start():
    assert depth_alpha_schedule(0, 8) == (0, 1.0)


def test_schedule_stable_phase():
    # first 100k imgs: depth 0 stable
    assert depth_alpha_schedule(99_999, 8) == (0, 1.0)


def test_schedule_fade_phase():
    # 100k..200k: depth 1 fading in, alpha = progress through transition
    d, a = depth_alpha_schedule(100_000, 8)
    assert d == 1 and a == 0.0
    d, a = depth_alpha_schedule(150_000, 8)
    assert d == 1 and a == pytest.approx(0.5)
    d, a = depth_alpha_schedule(199_999, 8)
    assert d == 1 and a == pytest.approx(0.99999)


def test_schedule_next_stable():
    d, a = depth_alpha_schedule(200_000, 8)
    assert d == 1 and a == 1.0
    d, a = depth_alpha_schedule(299_999, 8)
    assert d == 1 and a == 1.0
    d, a = depth_alpha_schedule(300_000, 8)
    assert d == 2 and a == 0.0


def test_schedule_max_depth_clamp():
    # past the last stage, depth clamps and alpha pins to 1.0
    d, a = depth_alpha_schedule(10_000_000, 3)
    assert d == 3 and a == 1.0


def test_schedule_monotone_depth():
    prev = -1
    for nimg in range(0, 2_000_000, 7919):
        d, a = depth_alpha_schedule(nimg, 8)
        assert d >= prev
        assert 0.0 <= a <= 1.0
        prev = d


def test_minibatch_and_tick_overrides():
    # reference plugins.py:19-22
    assert minibatch_for_depth(0) == 16
    assert minibatch_for_depth(6) == 14
    assert minibatch_for_depth(7) == 6
    assert minibatch_for_depth(8) == 3
    assert tick_kimg_for_depth(0) == 20
    assert tick_kimg_for_depth(5) == 5
    assert tick_kimg_for_depth(8) == 1


def test_lr_rampup():
    assert lr_rampup(40_000, 40) == 1.0
    assert lr_rampup(1_000_000, 40) == 1.0
    assert lr_rampup(0, 40) == pytest.approx(math.exp(-5.0))
    assert lr_rampup(20_000, 40) == pytest.approx(math.exp(-5.0 * 0.25))
    assert lr_rampup(0, 0) == 1.0


def test_lod_value():
    # reference plugins.py:51-55: lod = max_lod - depth_offset - depth - alpha + 1
    assert lod_value(2, 0.5, 10, 2) == pytest.approx(10 - 2 - 2 - 0.5 + 1)
    assert lod_value(2, 0.5, None, None) == -1.0
