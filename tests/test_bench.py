"""Smoke tests for the driver-facing bench.py (CPU backend).

The driver runs bench.py on the real TPU every round; these only guard the
plumbing (pipeline builds, measurement loop terminates, XLA FLOP count is
sane) so a refactor can't silently break the recorded benchmark.
"""

import numpy as np

import bench


def test_build_measure_and_flops_xla_backends():
    for backend in ("auto", "xla"):
        fn, inputs, fe = bench.build_pipeline(8, backend)
        out = np.asarray(fn(inputs[0]))
        assert out.shape == (8, 4) and np.isfinite(out).all()
    fpc = bench.flops_per_clip(fn, inputs[0], fe)
    # wav->logits on a 5 s clip is a few GFLOP (radix-2 DFT + CNN)
    assert fpc is not None and 1e8 < fpc < 1e11, fpc


def test_measure_returns_positive_rate():
    fn, inputs, _ = bench.build_pipeline(8, "auto")
    cps = bench.measure(fn, inputs, 8)
    assert cps > 0


def test_analytic_kernel_flops_sane():
    """The Pallas FLOP model (VERDICT r2 #7) must sit in the right
    neighborhood: radix-4 quarters the dense DFT work vs radix-2's half vs
    the full-DFT bf16x3, with everything inside the same order of
    magnitude as the XLA radix-2 path's cost-analysis count (which the
    sweep table already trusts)."""
    from audio_classification_icbhi_tpu.ops.pallas_mel import analytic_flops

    length = 80000  # 5 s @ 16 kHz
    r4 = analytic_flops("radix4_fused", length, 2048, 512, 128)
    r2 = analytic_flops("radix2_fused", length, 2048, 512, 128)
    full = analytic_flops("bf16x3", length, 2048, 512, 128)
    assert 1e8 < r4 < r2 < full < 1e11, (r4, r2, full)
    # dense-DFT ratio ~2x between levels (padding + fixed mel work blur it)
    assert 1.5 < r2 / r4 < 2.6
    # pass scaling: f32 counts one dot where bf16x3 counts three
    f32 = analytic_flops("f32", length, 2048, 512, 128)
    assert 2.0 < full / f32 < 3.2
    # each deeper DIF level removes real DFT work (equal 4-pass basis):
    # radix-16's K=128 cols ~0.52x radix-8's K=256 work
    r8 = analytic_flops("radix8dif_fused", length, 2048, 512, 128, dft_passes=4)
    r16 = analytic_flops("radix16dif_fused", length, 2048, 512, 128, dft_passes=4)
    assert r16 < r8 < r4, (r16, r8, r4)
    # the shared 3-pass mel projection dilutes the DFT-only ~0.52 ratio
    assert 0.45 < (r16 / r8) < 0.85
    # production default is the 5-pass asymmetric split: strictly more
    # counted work than 4, less than 6
    r16_5 = analytic_flops("radix16dif_fused", length, 2048, 512, 128)
    r16_6 = analytic_flops("radix16dif_fused", length, 2048, 512, 128, dft_passes=6)
    assert r16 < r16_5 < r16_6


def test_parity_battery_shapes():
    wavs = bench.parity_battery(16000)
    assert wavs.shape == (8, 16000) and wavs.dtype == np.float32
    assert np.isfinite(wavs).all()


def test_perf_floor_gate(monkeypatch):
    """VERDICT r4 #5: the committed regression gate. On CPU the floor is
    exempt (perf_floor() -> None: it's a TPU number), but the --assert-min
    path must fail loudly when the measured rate sits under the floor and
    pass when above — checked by stubbing the measurement."""
    import json
    import pytest

    assert bench.perf_floor() is None  # CPU suite: floor never gates

    with open("/root/repo/PERF_FLOORS.json") as f:
        floors = json.load(f)
    floor = floors["wav_to_logits_clips_per_sec_per_chip_min"]
    assert floor >= 50000  # guards against someone zeroing the gate

    monkeypatch.setattr(bench, "build_pipeline",
                        lambda batch: (None, [None], None))
    monkeypatch.setattr(bench, "measure", lambda fn, inputs, batch: 100.0)
    with pytest.raises(SystemExit) as ei:
        bench.main(assert_min=floor)
    assert ei.value.code == 1

    monkeypatch.setattr(bench, "measure",
                        lambda fn, inputs, batch: floor + 1.0)
    bench.main(assert_min=floor)  # above floor: returns normally
