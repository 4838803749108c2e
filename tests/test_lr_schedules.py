"""LR schedule parity with the reference lr_scheduler.py formulas."""

import numpy as np

from slice3d_tpu.train.lr_schedules import (
    from_scheduler_config,
    warmup_cosine,
    warmup_cosine2,
    warmup_linear,
)


def test_warmup_cosine_shape():
    s = warmup_cosine(100, 0.0, 1.0, 0.1, 1000)
    assert abs(float(s(0)) - 0.1) < 1e-6
    assert abs(float(s(100)) - 1.0) < 1e-2
    assert float(s(1000)) < 1e-6
    # monotone decreasing after warmup
    vals = [float(s(t)) for t in range(100, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def _ref_linear(n, wu, fmin, fmax, fstart, cl):
    # reference LambdaLinearScheduler.schedule, single cycle
    # (lr_scheduler.py:88-97)
    if n < wu:
        return (fmax - fstart) / wu * n + fstart
    return fmin + (fmax - fmin) * (cl - n) / cl


def test_warmup_linear_matches_reference():
    wu, fmin, fmax, fstart, cl = 10, 0.0, 1.0, 1e-6, 110
    s = warmup_linear([wu], [fmin], [fmax], [fstart], [cl])
    for n in [0, 3, 9, 10, 11, 42, 60, 109, 110]:
        assert abs(float(s(n)) - _ref_linear(n, wu, fmin, fmax, fstart, cl)) < 1e-6


def test_warmup_linear_cycles():
    # two cycles with different shapes; step past the first boundary
    s = warmup_linear([10, 5], [0.0, 0.1], [1.0, 0.5], [0.0, 0.0], [100, 50])
    # inside cycle 2: n_global=120 -> cycle offset 20
    expect = _ref_linear(20, 5, 0.1, 0.5, 0.0, 50)
    assert abs(float(s(120)) - expect) < 1e-6


def test_warmup_cosine2_single_cycle_matches_cosine1():
    s1 = warmup_cosine(10, 0.0, 1.0, 0.1, 100)
    s2 = warmup_cosine2([10], [0.0], [1.0], [0.1], [100])
    for n in [0, 5, 10, 50, 99]:
        assert abs(float(s1(n)) - float(s2(n))) < 1e-5


def test_from_scheduler_config():
    s = from_scheduler_config({
        "target": "ldm.lr_scheduler.LambdaLinearScheduler",
        "params": {"warm_up_steps": [100], "f_min": [1.0], "f_max": [1.0],
                   "f_start": [1e-6], "cycle_lengths": [10000000000000],
                   "verbosity_interval": 0},
    })
    assert abs(float(s(0)) - 1e-6) < 1e-9
    assert abs(float(s(100)) - 1.0) < 1e-6
    assert abs(float(s(5000)) - 1.0) < 1e-4
    assert from_scheduler_config(None) is None
