import numpy as np

from slice3d_tpu.train.lr_schedules import warmup_cosine, warmup_linear


def test_warmup_cosine_shape():
    s = warmup_cosine(100, 0.0, 1.0, 0.1, 1000)
    assert abs(float(s(0)) - 0.1) < 1e-6
    assert abs(float(s(100)) - 1.0) < 1e-2
    assert float(s(1000)) < 1e-6
    # monotone decreasing after warmup
    vals = [float(s(t)) for t in range(100, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_warmup_linear():
    s = warmup_linear(10, 0.0, 1.0, 0.0, 110)
    assert float(s(10)) == 1.0
    assert abs(float(s(60)) - 0.5) < 1e-6
    assert float(s(110)) == 0.0
