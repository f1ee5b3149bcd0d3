"""HBM-lean inference forward for LightweightCNN.

The measured roofline (ROOFLINE_r05.json) shows the eval conv stack is
HBM-bound (80.7% of v5e streaming peak at batch 128) because each
block's full-resolution pre-pool activation round-trips HBM; measured
in isolation blocks 1-3 move 3.29, 2.08 and 1.19 MB/clip against fused
floors of 0.40, 0.48 and 0.24 (the whole stack is 6.52 MB/clip —
isolated rows double-count boundary buffers). `make_fused_apply`
builds a drop-in
replacement for `model.apply(variables, feats, train=False)` that runs
blocks 1-3 through the fused Pallas kernels (ops/pallas_conv.py:
conv+BN+ReLU+pool per block in one VMEM pass) and blocks 4-5 + the head
through the same lax ops flax lowers to (at their shapes the packed
kernels' window inflation cancels the fusion dividend, so XLA keeps
them).

Semantics match the reference CNN's eval path (reference
src/models/cnn.py:24-29, 44-60): conv3x3 (pad 1, no bias) in bf16,
BatchNorm with running stats, ReLU, maxpool 2x2, dropout inactive, global
average pool, Dense 256->128->ReLU->Dense->num_classes, logits f32.
Numerics are bf16-grade like the flax path (which also convolves in
bf16); tests pin fused-vs-flax logits agreement.

Use it for inference-only paths (bench.py, inference engine). Training
and anything needing AD or batch-stat updates stays on flax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_conv import (
    fused_conv_block1,
    fused_conv_block2,
    fused_conv_block3,
)

_BN_EPS = 1e-5  # flax/torch default, models/cnn.py:57


def _conv_bn_relu_pool(x, kernel, scale, bias, mean, var):
    """One eval-mode ConvBlock via lax (blocks 2-5), bf16 compute."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), jnp.asarray(kernel, jnp.bfloat16),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s = jnp.asarray(scale) * jax.lax.rsqrt(jnp.asarray(var) + _BN_EPS)
    t = jnp.asarray(bias) - jnp.asarray(mean) * s
    y = jnp.maximum(y * s.astype(y.dtype) + t.astype(y.dtype), 0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def make_fused_apply(variables, *, interpret: bool = False):
    """Return fn(feats (B, H, W, 1) f32) -> logits (B, num_classes) f32.

    `variables` is the LightweightCNN variables tree ({'params', 'batch_stats'}).
    The returned fn is jittable; Pallas constants are folded on the host
    from the concrete weights, so build it once per checkpoint.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def _round4(n):
        return -((-n) // 4) * 4

    def _bn_args(i):
        bp = params[f"ConvBlock_{i}"]
        bs = stats[f"ConvBlock_{i}"]["BatchNorm_0"]
        return (bp["Conv_0"]["kernel"], bp["BatchNorm_0"]["scale"],
                bp["BatchNorm_0"]["bias"], bs["mean"], bs["var"])

    def apply_fn(feats):
        hh, ww = feats.shape[1], feats.shape[2]
        h1, w1 = hh // 2, ww // 2
        # chain decisions and pad widths are static: each fused block emits
        # the zero columns its successor needs, fused into its own output
        # relayout, so no standalone HBM pad copy sits between kernels
        chain2 = h1 % 2 == 0 and h1 >= 4 and w1 >= 4
        x = fused_conv_block1(
            feats, *_bn_args(0), eps=_BN_EPS, interpret=interpret,
            pad_out_w=_round4(w1 + 2) if chain2 else None,
        )
        start = 1
        if chain2:
            h2, w2 = h1 // 2, w1 // 2
            chain3 = h2 % 2 == 0 and h2 >= 4 and w2 >= 4
            x = fused_conv_block2(
                x, *_bn_args(1), eps=_BN_EPS, interpret=interpret,
                true_w=w1, pad_out_w=_round4(w2 + 2) if chain3 else None,
            )
            start = 2
            if chain3:
                x = fused_conv_block3(
                    x, *_bn_args(2), eps=_BN_EPS, interpret=interpret,
                    true_w=w2,
                )
                start = 3
        for i in range(start, 5):
            blk = f"ConvBlock_{i}"
            x = _conv_bn_relu_pool(
                x, params[blk]["Conv_0"]["kernel"],
                params[blk]["BatchNorm_0"]["scale"],
                params[blk]["BatchNorm_0"]["bias"],
                stats[blk]["BatchNorm_0"]["mean"],
                stats[blk]["BatchNorm_0"]["var"],
            )
        x = jnp.mean(x, axis=(1, 2))                      # GAP -> (B, 256)
        d0, d1 = params["Dense_0"], params["Dense_1"]
        x = x.astype(jnp.bfloat16) @ d0["kernel"].astype(jnp.bfloat16)
        x = jnp.maximum(x + d0["bias"].astype(x.dtype), 0)
        x = x @ d1["kernel"].astype(jnp.bfloat16) + d1["bias"].astype(jnp.bfloat16)
        return x.astype(jnp.float32)

    return apply_fn


def fused_apply_supported(feats_shape) -> bool:
    """True when the Pallas block1 profile covers this feature shape."""
    if len(feats_shape) != 4:
        return False
    _, h, w, c = feats_shape
    return c == 1 and h % 16 == 0 and h >= 32 and w >= 4


def fused_cnn_enabled(feats_shape=None) -> bool:
    """Central policy switch: should inference use the fused Pallas CNN?

    Returns True only when `ICBHI_FUSED_CNN=1` (or the legacy
    `BENCH_FUSED_CNN=1`) is set AND the default backend is TPU AND the
    feature shape (when given) fits the kernel profile AND the
    compile-and-verify probe passes. Every production call site
    (bench.py, ClassifierEngine, the analyzer engine, __graft_entry__)
    routes through this one function.

    Default is OFF: the r5 on-chip A/B measured the fused chain SLOWER
    than XLA's convs despite its ~8x HBM-byte win — isolated CNN stage
    56.4k clips/s fused vs 101.6k XLA at batch 128 (stage_bench), end to
    end 39.7k vs 58.5k (bench.py, batch 128) and 33.4k vs 51.6k at 1024.
    The per-example `grid=(b,)` kernels spend their time on small
    serialized matmuls (block1's banded scheme inflates 11.6 MFLOP/clip
    of intrinsic conv work to ~83 MFLOP at K=64, N=157 tile fill), so the
    measured bound from ROOFLINE_r05.json (80.7% of HBM peak) buys
    nothing back. XLA's conv+reduce-window stays the production path;
    the kernels remain a correct, tested opt-in and a documented
    negative result (PARITY.md r5).
    """
    import os

    env = os.environ.get("ICBHI_FUSED_CNN",
                         os.environ.get("BENCH_FUSED_CNN", "0"))
    if env != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if feats_shape is not None and not fused_apply_supported(feats_shape):
        return False
    return fused_kernels_available()


_PROBE_OK: bool | None = None


def fused_kernels_available() -> bool:
    """Compile-and-check the Pallas kernels on the current default backend.

    Runs each fused block once on tiny inputs and compares against a
    numpy ground truth; caches the verdict. Callers use this before
    selecting the fused path so an unattended run (bench.py, the driver)
    degrades to the flax apply instead of crashing if this JAX/Mosaic
    version rejects a lowering pattern or mis-lowers a roll/reshape.
    """
    global _PROBE_OK
    if _PROBE_OK is not None:
        return _PROBE_OK
    import numpy as np

    from ..ops.pallas_conv import (fused_conv_block1, fused_conv_block2,
                                   fused_conv_block3)

    try:
        rng = np.random.default_rng(0)
        x1 = rng.standard_normal((1, 32, 8, 1)).astype(np.float32)
        k1 = rng.standard_normal((3, 3, 1, 32)).astype(np.float32) * 0.1
        ones, zeros = np.ones(32, np.float32), np.zeros(32, np.float32)
        got = np.asarray(fused_conv_block1(
            jnp.asarray(x1), k1, ones, zeros, zeros, ones), np.float64)
        ref = _conv_pool_np(x1, k1)
        if got.shape != ref.shape or np.abs(got - ref).max() > 2e-2:
            raise AssertionError("block1 probe numerics mismatch")
        x2 = rng.standard_normal((1, 4, 8, 32)).astype(np.float32)
        k2 = rng.standard_normal((3, 3, 32, 64)).astype(np.float32) * 0.1
        o64, z64 = np.ones(64, np.float32), np.zeros(64, np.float32)
        got2 = np.asarray(fused_conv_block2(
            jnp.asarray(x2), k2, o64, z64, z64, o64), np.float64)
        ref2 = _conv_pool_np(x2, k2)
        if got2.shape != ref2.shape or np.abs(got2 - ref2).max() > 2e-2:
            raise AssertionError("block2 probe numerics mismatch")
        x3 = rng.standard_normal((1, 4, 8, 64)).astype(np.float32)
        k3 = rng.standard_normal((3, 3, 64, 128)).astype(np.float32) * 0.1
        o128, z128 = np.ones(128, np.float32), np.zeros(128, np.float32)
        got3 = np.asarray(fused_conv_block3(
            jnp.asarray(x3), k3, o128, z128, z128, o128), np.float64)
        ref3 = _conv_pool_np(x3, k3)
        if got3.shape != ref3.shape or np.abs(got3 - ref3).max() > 5e-2:
            raise AssertionError("block3 probe numerics mismatch")
        _PROBE_OK = True
    except Exception as exc:  # pragma: no cover - depends on backend version
        import warnings

        warnings.warn(f"fused CNN kernels unavailable on this backend "
                      f"({type(exc).__name__}: {exc}); using the flax path")
        _PROBE_OK = False
    return _PROBE_OK


def _conv_pool_np(x, k, eps: float = 1e-5):
    """Numpy ground truth for the probe: conv3x3 + identity BN + relu + pool."""
    import numpy as np

    xx = np.asarray(x, np.float64)
    kk = np.asarray(k, np.float64)
    b, h, w, ci = xx.shape
    co = kk.shape[-1]
    xp = np.zeros((b, h + 2, w + 2, ci))
    xp[:, 1:-1, 1:-1] = xx
    conv = np.zeros((b, h, w, co))
    for dh in range(3):
        for dw in range(3):
            conv += np.einsum("bhwc,co->bhwo", xp[:, dh:dh + h, dw:dw + w],
                              kk[dh, dw])
    y = np.maximum(conv / np.sqrt(1.0 + eps), 0.0)
    out = np.zeros((b, h // 2, w // 2, co))
    for i in range(h // 2):
        for j in range(w // 2):
            out[:, i, j] = y[:, 2 * i:2 * i + 2, 2 * j:2 * j + 2].reshape(
                b, 4, co).max(1)
    return out
