"""The fast "%.15g" LR-row formatter must be byte-identical to
format_float (R as.character semantics) for every finite value the sink
can see."""

import numpy as np

from ldweaver_tpu.io.writers import format_float


def test_percent_g_matches_format_float_randomized():
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.uniform(0, 1, 20000),  # MI range
            rng.uniform(0, 1.1e6, 20000),  # len range
            rng.integers(0, 2_200_000, 10000).astype(np.float64),  # integral
            rng.integers(0, 2_200_000, 10000) + 0.5,  # half-integral lens
            np.array([0.0, -0.0 + 0.0, 1e-300, 1e15 - 2.0, 2.5e15]),
        ]
    )
    for v in vals:
        assert "%.15g" % v == format_float(v), v


def test_negative_zero_normalisation():
    assert "%.15g" % (-0.0 + 0.0) == "0" == format_float(-0.0)
