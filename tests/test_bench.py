"""Smoke tests for the driver-facing bench.py (CPU backend).

The driver runs bench.py on the real TPU every round; these only guard the
plumbing (pipeline builds, measurement loop terminates, XLA FLOP count is
sane) so a refactor can't silently break the recorded benchmark.
"""

import numpy as np

import bench


def test_build_measure_and_flops_xla_backends():
    for backend in ("auto", "xla"):
        fn, inputs = bench.build_pipeline(8, backend)
        out = np.asarray(fn(inputs[0]))
        assert out.shape == (8, 4) and np.isfinite(out).all()
    fpc = bench.flops_per_clip(fn, inputs[0])
    # wav->logits on a 5 s clip is a few GFLOP (radix-2 DFT + CNN)
    assert fpc is not None and 1e8 < fpc < 1e11, fpc


def test_measure_returns_positive_rate():
    fn, inputs = bench.build_pipeline(8, "auto")
    cps = bench.measure(fn, inputs, 8)
    assert cps > 0
