"""Fused Pallas TPU kernel: frames -> windowed DFT -> power -> mel -> dB.

The XLA path (ops/mel.log_mel_spectrogram) materializes the re/im and power
spectra in HBM between matmuls — for a (128, 157)-frame batch that is
~250 MB of intermediate traffic per step. This kernel keeps the whole chain
in VMEM: for each (batch, frame-tile) grid cell it loops over frequency
tiles, computing

    re = frames @ (w*C)[., ftile]   (MXU)
    im = frames @ (w*S)[., ftile]   (MXU)
    mel += (re*re + im*im) @ fb[ftile, .]   (VPU + MXU, accumulated in VMEM)

and writes only the final (TILE_T, n_mels) log-mel block to HBM. The
windowed DFT matrices stream through VMEM one frequency tile at a time, so
VMEM never holds the full 16.8 MB constant.

Numerics match the XLA matmul path (both run the MXU at the requested
precision); parity with the float64 golden is covered by tests/test_dsp.py.

Falls back transparently: log_mel_pallas(...) == mel_ops.log_mel chain, same
(B, n_mels, T) output as torchaudio layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_classification_icbhi_tpu.ops import mel as mel_ops
from audio_classification_icbhi_tpu.ops import stft as stft_ops


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _constants(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str, norm,
               f_min: float = 0.0, f_max: float | None = None):
    """(windowed cos, windowed sin, mel fb) padded to lane multiples."""
    wc, ws = stft_ops._windowed_dft_np(n_fft)
    fb = np.asarray(
        mel_ops._mel_filterbank_np(
            sample_rate, n_fft, n_mels, float(f_min),
            sample_rate / 2.0 if f_max is None else float(f_max),
            mel_scale, norm)
    )
    n_bins = n_fft // 2 + 1
    f_pad = _round_up(n_bins, 128)
    m_pad = _round_up(n_mels, 128)
    wc_p = np.zeros((n_fft, f_pad), np.float32)
    ws_p = np.zeros((n_fft, f_pad), np.float32)
    fb_p = np.zeros((f_pad, m_pad), np.float32)
    wc_p[:, :n_bins] = wc
    ws_p[:, :n_bins] = ws
    fb_p[:n_bins, :n_mels] = fb  # padded bins have zero filters -> no effect
    return wc_p, ws_p, fb_p


def _split_bf16(x: np.ndarray) -> np.ndarray:
    """f32 -> stacked (2, ...) bf16 hi/lo components with x ~= hi + lo
    (one split implementation for the whole repo: ops/mel._split_bf16_np)."""
    return np.stack(mel_ops._split_bf16_np(x))


def _split_bf16_n(x: np.ndarray, components: int) -> np.ndarray:
    """f32 -> stacked (components, ...) bf16 parts. components=3 adds a
    mid term so hi+mid+lo captures all 24 f32 mantissa bits — the host
    side of the passes>=6 f32-equivalent DFT mode (VERDICT r3 #4)."""
    if components == 2:
        return _split_bf16(x)
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    r = x - hi.astype(np.float32)
    mid = r.astype(ml_dtypes.bfloat16)
    lo = (r - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([np.asarray(hi), np.asarray(mid), np.asarray(lo)])


@functools.lru_cache(maxsize=8)
def _constants_bf16x3(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str, norm,
                      f_min: float = 0.0, f_max: float | None = None):
    wc, ws, fb = _constants(sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max)
    return _split_bf16(wc), _split_bf16(ws), fb


@functools.lru_cache(maxsize=8)
def _constants_radix2(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str, norm,
                      f_min: float = 0.0, f_max: float | None = None):
    """Radix-2 decimation-in-time constants.

    The 2048-point windowed rDFT splits into two 1024-point DFTs over the
    even/odd samples (window folded per-parity into the matrices), HALVING
    the matmul FLOPs. Conjugate symmetry of the upper 511 bins and the
    Nyquist bin folds into three combined mel matrices, so the kernel needs
    no bin reversal:

        P,Q = e @ (Ce,Se); R,T = o @ (Co,So)        # 4 matmuls, 1024-deep
        A = P^2+Q^2+R^2+T^2; B = PR+QT; D = PT-QR   # VPU
        mel = A@FA + B@FB + D@FD                    # one fused matmul

    where for j=0..512, with c_k = cos(pi k/1024), s_k = sin(pi k/1024):
        power[k]      = A + 2 c_k B - 2 s_k D        (k = j, lower half)
        power[1024+j'] folds via A,B,D at j = 1024-k (upper half)
        power[1024]   = A[0] - 2 B[0]                (Nyquist)
    Verified exact (1e-9 vs rfft) in numpy before kerneling.

    The unpadded derivation (windowed even/odd DFT matrices, twiddle
    vectors, conjugate-folded fb_lo/fb_hi — incl. the explicit re/im
    reconstruction rationale and the fb_hi[j] = fb[n_fft/2 - j]
    pre-permutation) lives ONCE in ops/mel._radix2_xla_constants, shared
    with the XLA radix-2 path; this wrapper only pads to lane multiples
    and splits bf16 hi/lo for the kernel.
    """
    h = n_fft // 2          # 1024
    nb = h // 2 + 1         # 513 half-spectrum bins
    ce, se, co, so, cj, sj, fb_lo, fb_hi = mel_ops._radix2_xla_constants(
        sample_rate, n_fft, n_mels, mel_scale, norm, float(f_min),
        None if f_max is None else float(f_max),
    )

    nb_pad = _round_up(nb, 128)
    m_pad = _round_up(n_mels, 128)

    def padk(x):
        out = np.zeros((h, nb_pad), np.float32)
        out[:, :nb] = x
        return out

    def padf(x):
        out = np.zeros((nb_pad, m_pad), np.float32)
        out[:nb, :n_mels] = x
        return out

    def padv(x):
        out = np.zeros((1, nb_pad), np.float32)
        out[0, :nb] = x
        return out

    return (
        _split_bf16(padk(ce)), _split_bf16(padk(se)),
        _split_bf16(padk(co)), _split_bf16(padk(so)),
        padv(cj), padv(sj), padf(fb_lo), padf(fb_hi),
    )


@functools.lru_cache(maxsize=8)
def _constants_radix4(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str, norm,
                      f_min: float = 0.0, f_max: float | None = None):
    """Radix-4 decimation-in-time constants (the radix-2 trick applied twice).

    The n_fft-point windowed rDFT splits into FOUR (n_fft/4)-point real DFTs
    over the mod-4 sample streams (window folded per stream), QUARTERING the
    dense matmul FLOPs vs the full DFT (half of radix-2); only the
    q/2+1 = 257 unique bins of each real sub-DFT are computed. The full
    1025-bin power spectrum is reconstructed in four jp-indexed regions —

        A: k = jp          (jp = 0..256)
        B: k = 512 - jp    (jp = 1..255,  conjugated sub-spectra)
        C: k = 512 + jp    (jp = 0..256)
        D: k = 1024 - jp   (jp = 0..255,  conjugated; jp=0 is Nyquist)

    — with X(k) = sum_j e^(-2*pi*i*j*k/n_fft) S_j(k mod q) and conjugate
    symmetry S_j(q - f) = conj(S_j(f)) folded HOST-SIDE into per-region
    twiddle vectors and pre-permuted mel matrices (fb_r[jp] = fb[k_r(jp)]),
    so the kernel never reverses lanes — the same construction that builds
    radix-2's fb_hi, one level deeper. Verified exact (2e-14 vs rfft) in
    numpy before kerneling.

    Returns (dft, tw, fbs): dft = 8 hi/lo-split (q, nb_pad) matrices
    (cos, sin per stream), tw = (24, nb_pad) f32 rows laid out as
    [region*6 + (j-1)] = cos twiddles and [region*6 + 3 + (j-1)] = sin
    twiddles for j = 1..3 (j=0's twiddle is 1), fbs = (4, nb_pad, m_pad).
    """
    q = n_fft // 4
    nb4 = q // 2 + 1
    m = np.arange(q)
    f = np.arange(nb4)
    ang = 2.0 * np.pi * np.outer(m, f) / q
    n = np.arange(n_fft)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    nb_pad = _round_up(nb4, 128)
    m_pad = _round_up(n_mels, 128)

    def padk(x):
        out = np.zeros((q, nb_pad), np.float32)
        out[:, :nb4] = x
        return out

    dft = []
    for j in range(4):
        wj = w[j::4][:, None]
        dft.append(_split_bf16(padk(wj * np.cos(ang))))
        dft.append(_split_bf16(padk(wj * np.sin(ang))))

    fb = np.asarray(
        mel_ops._mel_filterbank_np(
            sample_rate, n_fft, n_mels, float(f_min),
            sample_rate / 2.0 if f_max is None else float(f_max),
            mel_scale, norm)
    )

    half = n_fft // 2
    regions = (
        (lambda jp: jp, range(0, nb4)),
        (lambda jp: q - jp, range(1, nb4 - 1)),
        (lambda jp: q + jp, range(0, nb4)),
        (lambda jp: half - jp, range(0, nb4 - 1)),
    )
    tw = np.zeros((24, nb_pad), np.float32)
    fbs = np.zeros((4, nb_pad, m_pad), np.float32)
    for r, (kof, jps) in enumerate(regions):
        for jp in jps:
            k = kof(jp)
            for j in (1, 2, 3):
                tw[r * 6 + (j - 1), jp] = np.cos(2.0 * np.pi * j * k / n_fft)
                tw[r * 6 + 3 + (j - 1), jp] = np.sin(2.0 * np.pi * j * k / n_fft)
            fbs[r, jp, :n_mels] = fb[k]
    return tuple(dft), tw, fbs


@functools.lru_cache(maxsize=8)
def _constants_radix4dif(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str,
                         norm, f_min: float = 0.0, f_max: float | None = None):
    """Radix-4 decimation-in-FREQUENCY constants.

    Unlike the DIT kernels, DIF consumes CONTIGUOUS quarter blocks of each
    windowed frame (a, b, c, d = frame[0:q], [q:2q], ...), so the wrapper
    never de-interleaves sample streams — the measured batch-512 knee was
    exactly that de-interleave (4 strided-slice HBM passes, ~4 ms at 512
    clips, serialized against a 5.8 ms kernel; an XLA transpose measures
    the same). Output bins split by k mod 4:

        u_0 = a+b+c+d              (real)    k = 4f,  DFT_q, f = 0..q/2
        u_1 = (a-c) - i(b-d); v_1 = u_1 * e^{-2pi i m/N}
                                   (complex) k = 4f+1 from DFT_q(v_1)[f],
                                             f = 0..255, AND k = 4f+3 =
                                             |DFT_q(v_1)[q-1-f]| (conjugate
                                             symmetry, power only — regions
                                             B and D share one matmul)
        u_2 = a-b+c-d              (real)    k = 4f+2 via the odd-bin
                                             half-DFT: angles
                                             2pi m (2f+1)/(N/2), f = 0..255

    Verified exact (2e-12 vs rfft) in numpy before kerneling. Executed
    matmul columns 3328 vs DIT's 3072 (+8%) — u_1's complex sub-DFT loses
    real-input symmetry — but the mel stage drops to 3 matmuls (1152 cols
    vs 1536) and the whole de-interleave prep disappears.

    Returns (dft, wtw, fbs): dft = 6 hi/lo-split matrices
    (C0, S0 (q, nb0_pad); C1, S1 (q, q); C2, S2 (q, q//2)); wtw = (6, 1, q)
    f32 rows [w_a, w_b, w_c, w_d, cos1, sin1]; fbs = (FA (nb0_pad, m_pad),
    FB (q, m_pad), FC (q//2, m_pad)) pre-permuted mel matrices."""
    q = n_fft // 4
    m = np.arange(q)
    n = np.arange(n_fft)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    nb0 = q // 2 + 1
    nb0_pad = _round_up(nb0, 128)
    m_pad = _round_up(n_mels, 128)

    ang0 = 2.0 * np.pi * np.outer(m, np.arange(nb0)) / q
    c0 = np.zeros((q, nb0_pad), np.float32)
    s0 = np.zeros((q, nb0_pad), np.float32)
    c0[:, :nb0] = np.cos(ang0)
    s0[:, :nb0] = np.sin(ang0)
    ang1 = 2.0 * np.pi * np.outer(m, np.arange(q)) / q
    c1m = np.cos(ang1).astype(np.float32)
    s1m = np.sin(ang1).astype(np.float32)
    ang2 = 2.0 * np.pi * np.outer(m, 2 * np.arange(q // 2) + 1) / (n_fft // 2)
    c2m = np.cos(ang2).astype(np.float32)
    s2m = np.sin(ang2).astype(np.float32)
    dft = tuple(_split_bf16(x) for x in (c0, s0, c1m, s1m, c2m, s2m))

    wtw = np.zeros((6, 1, q), np.float32)
    for j in range(4):
        wtw[j, 0] = w[j * q:(j + 1) * q]
    wtw[4, 0] = np.cos(2.0 * np.pi * m / n_fft)
    wtw[5, 0] = np.sin(2.0 * np.pi * m / n_fft)

    fb = np.asarray(
        mel_ops._mel_filterbank_np(
            sample_rate, n_fft, n_mels, float(f_min),
            sample_rate / 2.0 if f_max is None else float(f_max),
            mel_scale, norm)
    )
    half = n_fft // 2
    fa = np.zeros((nb0_pad, m_pad), np.float32)
    fbm = np.zeros((q, m_pad), np.float32)
    fc = np.zeros((q // 2, m_pad), np.float32)
    for f in range(nb0):
        fa[f, :n_mels] = fb[4 * f]
    for f in range(q // 2):
        fbm[f, :n_mels] = fb[4 * f + 1]
        if 4 * f + 3 <= half:
            fbm[q - 1 - f, :n_mels] += fb[4 * f + 3]
        fc[f, :n_mels] = fb[4 * f + 2]
    return dft, wtw, (fa, fbm, fc)


@functools.lru_cache(maxsize=8)
def _constants_radix8dif(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str,
                         norm, f_min: float = 0.0, f_max: float | None = None,
                         components: int = 2):
    """Radix-8 decimation-in-FREQUENCY constants.

    One more decimation level than _constants_radix4dif: the windowed frame
    splits into eight CONTIGUOUS blocks b_j = frame[jE:(j+1)E], E = n_fft/8,
    and the spectrum into k mod 8 residue classes

        X[8m+r] = DFT_E{ W_N^{rn} * u_r[n] }[m],
        u_r[n]  = sum_j W_8^{rj} b_j[n]

    The W_8 coefficients are 0/±1/±sqrt(1/2) scalars (plain VPU butterflies
    in the kernel) and the W_N^{rn} twiddles fold INTO the E-point DFT
    matrices host-side (M_r[n, m] = W_N^{rn} W_E^{nm}), so the kernel does
    no twiddle work at all. For real input only r = 0..4 are computed:

        r=0: u_0 real, half-spectrum (E/2+1 bins, k = 8m)
        r=4: u_4 real, 128 bins (k = 8m+4; twiddled, so no half-symmetry)
        r=1,2,3: complex u_r, FULL E-bin DFTs — bins with 8m+r > N/2 are
                 the conjugates of bins N-(8m+r) (≡ 7,6,5 mod 8), same
                 POWER, so they fold into the region mel matrices

    Executed matmul columns 3840 at K = E = 256 vs the radix-4 kernel's
    3328 at K = 512: 42% less DFT MXU work. Verified exact (2e-14 vs rfft,
    butterflies 2e-15) in numpy before kerneling.

    Returns (dft, wtw, fbs): dft = 10 hi/lo-split matrices (C0, S0
    (E, nb0_pad); C4, S4 (E, E//2); C1, S1, C2, S2, C3, S3 (E, E));
    wtw = (8, 1, E) f32 per-block window rows; fbs = (F0 (nb0_pad, m_pad),
    F4 (E//2, m_pad), F1, F2, F3 (E, m_pad)) pre-permuted mel matrices."""
    e = n_fft // 8
    half = n_fft // 2
    n = np.arange(e)
    full_n = np.arange(n_fft)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * full_n / n_fft))
    nb0 = e // 2 + 1
    nb0_pad = _round_up(nb0, 128)
    m_pad = _round_up(n_mels, 128)

    dft = []
    sp = functools.partial(_split_bf16_n, components=components)
    ang0 = 2.0 * np.pi * np.outer(n, np.arange(nb0)) / e
    c0 = np.zeros((e, nb0_pad), np.float32)
    s0 = np.zeros((e, nb0_pad), np.float32)
    c0[:, :nb0] = np.cos(ang0)
    s0[:, :nb0] = np.sin(ang0)
    dft += [sp(c0), sp(s0)]

    def folded(r, m_cols):
        tw = np.exp(-2j * np.pi * r * n / n_fft)
        m_mat = tw[:, None] * np.exp(-2j * np.pi * np.outer(n, np.arange(m_cols)) / e)
        return (sp(m_mat.real.astype(np.float32)),
                sp(m_mat.imag.astype(np.float32)))

    c4, s4 = folded(4, e // 2)
    dft += [c4, s4]
    for r in (1, 2, 3):
        cr, sr = folded(r, e)
        dft += [cr, sr]

    wtw = np.zeros((8, 1, e), np.float32)
    for j in range(8):
        wtw[j, 0] = w[j * e:(j + 1) * e]

    fb = np.asarray(
        mel_ops._mel_filterbank_np(
            sample_rate, n_fft, n_mels, float(f_min),
            sample_rate / 2.0 if f_max is None else float(f_max),
            mel_scale, norm)
    )
    f0 = np.zeros((nb0_pad, m_pad), np.float32)
    f0[:nb0, :n_mels] = fb[0:half + 1:8]
    f4 = np.zeros((e // 2, m_pad), np.float32)
    f4[:, :n_mels] = fb[4:half + 1:8]
    fbs = [f0, f4]
    for r in (1, 2, 3):
        fr = np.zeros((e, m_pad), np.float32)
        for m in range(e):
            k = 8 * m + r
            fr[m, :n_mels] = fb[k if k <= half else n_fft - k]
        fbs.append(fr)
    # mel matrices ship hi/lo-split for the kernel's 3-pass bf16 mel
    # projection (_dot_mel): power and filterbank are both NONNEGATIVE, so
    # every bf16 representation error stays elementwise-RELATIVE through the
    # sum — ~2^-18 per mel bin (5e-5 dB) even at floor bins — at half the
    # MXU passes of the former Precision.HIGHEST f32 dot.
    return tuple(dft), wtw, tuple(_split_bf16_n(f, 2) for f in fbs)


@functools.lru_cache(maxsize=8)
def _constants_radix16dif(sample_rate: int, n_fft: int, n_mels: int, mel_scale: str,
                          norm, f_min: float = 0.0, f_max: float | None = None,
                          components: int = 2):
    """Radix-16 decimation-in-FREQUENCY constants — one more level than
    _constants_radix8dif, the TERMINAL decimation for n_fft = 2048: the
    sixteenth blocks are s = n_fft/16 = 128 samples, exactly one lane
    register, so any deeper split would under-fill the MXU's K dimension.

        X[16m+r] = DFT_s{ W_N^{rn} u_r[n] }[m],
        u_r[n]   = sum_j W_16^{rj} b_j[n]

    The kernel computes u_r via a two-stage butterfly (a_j = b_j + b_{j+8}
    feeds the existing radix-8 combinations for even r; d_j = b_j - b_{j+8}
    with W_16 coefficients for odd r). For real input only r = 0..8 are
    computed: r=0 (real, half-spectrum, k = 16m), r=8 (real, twiddled,
    s/2 unique bins — the class maps onto itself under conjugation),
    r=1..7 complex FULL s-bin DFTs whose conjugate classes 15..9 fold into
    the region mel matrices.

    Executed matmul columns 3968 at K = s = 128 vs the radix-8 kernel's
    3840 at K = 256: 48% less DFT MXU work at equal passes. Region math
    verified exact (5.7e-14 vs rfft, butterflies 1e-12, every rfft bin
    covered exactly once) in numpy before kerneling.

    Returns (dft, wtw, fbs): dft = 18 hi/lo-split matrices (C0, S0
    (s, nb0_pad); C8, S8 (s, s//2); C1..C7, S1..S7 (s, s));
    wtw = (16, 1, s) f32 per-block window rows; fbs = (F0 (nb0_pad, m_pad),
    F8 (s//2, m_pad), F1..F7 (s, m_pad)) pre-permuted mel matrices."""
    s = n_fft // 16
    half = n_fft // 2
    n = np.arange(s)
    full_n = np.arange(n_fft)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * full_n / n_fft))
    nb0 = s // 2 + 1
    nb0_pad = _round_up(nb0, 128)
    m_pad = _round_up(n_mels, 128)

    dft = []
    sp = functools.partial(_split_bf16_n, components=components)
    ang0 = 2.0 * np.pi * np.outer(n, np.arange(nb0)) / s
    c0 = np.zeros((s, nb0_pad), np.float32)
    s0 = np.zeros((s, nb0_pad), np.float32)
    c0[:, :nb0] = np.cos(ang0)
    s0[:, :nb0] = np.sin(ang0)
    dft += [sp(c0), sp(s0)]

    def folded(r, m_cols):
        tw = np.exp(-2j * np.pi * r * n / n_fft)
        m_mat = tw[:, None] * np.exp(-2j * np.pi * np.outer(n, np.arange(m_cols)) / s)
        return (sp(m_mat.real.astype(np.float32)),
                sp(m_mat.imag.astype(np.float32)))

    c8, s8 = folded(8, s // 2)
    dft += [c8, s8]
    for r in range(1, 8):
        cr, sr = folded(r, s)
        dft += [cr, sr]

    wtw = np.zeros((16, 1, s), np.float32)
    for j in range(16):
        wtw[j, 0] = w[j * s:(j + 1) * s]

    fb = np.asarray(
        mel_ops._mel_filterbank_np(
            sample_rate, n_fft, n_mels, float(f_min),
            sample_rate / 2.0 if f_max is None else float(f_max),
            mel_scale, norm)
    )
    f0 = np.zeros((nb0_pad, m_pad), np.float32)
    f0[:nb0, :n_mels] = fb[0:half + 1:16]
    f8 = np.zeros((s // 2, m_pad), np.float32)
    f8[:, :n_mels] = fb[8:half + 1:16]
    fbs = [f0, f8]
    for r in range(1, 8):
        fr = np.zeros((s, m_pad), np.float32)
        for m in range(s):
            k = 16 * m + r
            fr[m, :n_mels] = fb[k if k <= half else n_fft - k]
        fbs.append(fr)
    # hi/lo-split mel matrices for the 3-pass bf16 mel projection — see
    # _constants_radix8dif for the nonnegativity argument.
    return tuple(dft), wtw, tuple(_split_bf16_n(f, 2) for f in fbs)


def _dot_f32(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )


def _dot_bf16(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_f32(frames_ref, wc_ref, ws_ref, fb_ref, out_ref, acc_ref, *, f_tiles: int):
    """Grid: (B, T_tiles, f_tiles). Frequency axis is the innermost grid dim;
    the mel accumulator lives in VMEM scratch across it. True-f32 MXU dots."""
    fi = pl.program_id(2)

    @pl.when(fi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    frames = frames_ref[0]  # block (1, TILE_T, n_fft) -> (TILE_T, n_fft)
    re = _dot_f32(frames, wc_ref[:])
    im = _dot_f32(frames, ws_ref[:])
    power = re * re + im * im  # (TILE_T, F_TILE)
    acc_ref[:] += _dot_f32(power, fb_ref[:])

    @pl.when(fi == f_tiles - 1)
    def _():
        # amplitude_to_db, torchaudio power semantics (10*log10(max(x, 1e-10)))
        out_ref[0] = 10.0 * jnp.log10(jnp.maximum(acc_ref[:], 1e-10))


def _kernel_bf16x3(frames_ref, wc_ref, ws_ref, fb_ref, out_ref, acc_ref, *, f_tiles: int):
    """bf16x3 variant: Mosaic has no Precision.HIGH, so the decomposition is
    explicit — frames split into bf16 hi+lo in-kernel, DFT matrices pre-split
    on the host (wc_ref/ws_ref carry (2, n_fft, F_TILE)); hi@hi + hi@lo +
    lo@hi gives ~f32 accuracy at 3 bf16 MXU passes per matmul, matching
    XLA's HIGH at the same FLOP count but without HBM intermediates."""
    fi = pl.program_id(2)

    @pl.when(fi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    frames = frames_ref[0]
    f_hi = frames.astype(jnp.bfloat16)
    f_lo = (frames - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot3(m_ref):
        hi, lo = m_ref[0], m_ref[1]
        return _dot_bf16(f_hi, hi) + _dot_bf16(f_hi, lo) + _dot_bf16(f_lo, hi)

    re = dot3(wc_ref)
    im = dot3(ws_ref)
    power = re * re + im * im
    acc_ref[:] += _dot_f32(power, fb_ref[:])

    @pl.when(fi == f_tiles - 1)
    def _():
        out_ref[0] = 10.0 * jnp.log10(jnp.maximum(acc_ref[:], 1e-10))


def _dot_hilo(x_hi, x_lo, m_ref, passes: int):
    """bf16 multi-pass product against a host-pre-split hi/lo matrix.

    passes=3 (hi@hi + hi@lo + lo@hi, XLA Precision.HIGH equivalent) is the
    default: on the worst-case tonal+noise parity battery it measures
    6.9e-4 dB vs the FFT reference — within the 1e-3 budget and
    indistinguishable from passes=4's 6.6e-4 (the dB error is dominated by
    the bf16 rounding of the three kept terms, not the dropped lo@lo whose
    magnitude is ~2^-18 of the operand norms) — while cutting DFT MXU work
    25% (+14% end-to-end wav->logits at batch 128 on v5e). passes=4 keeps
    the full lo@lo term for headroom on pathological inputs.
    """
    hi, lo = m_ref[0], m_ref[1]
    acc = _dot_bf16(x_hi, hi) + _dot_bf16(x_hi, lo) + _dot_bf16(x_lo, hi)
    if passes == 4:
        acc = acc + _dot_bf16(x_lo, lo)
    return acc


def _split_parts(x, passes: int):
    """Kernel-side operand split matching the pass budget: 2-way bf16
    hi/lo (passes<=4) or 3-way hi/mid/lo (passes>=5 — hi+mid+lo captures
    all 24 f32 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    if passes < 5:
        return (hi, r.astype(jnp.bfloat16))
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return (hi, mid, lo)


def _dot_parts(parts, m_ref, passes: int):
    """Multi-pass bf16 product against a host-pre-split matrix:
    2-way operand x 2-way matrix (passes 3/4, _dot_hilo), 3-way operand x
    2-way matrix (passes=5), or 3-way x 3-way (passes>=6).

    passes=5 is the ASYMMETRIC scheme (production default for the
    radix-8/16 DIF kernels): the in-kernel operand u is split 3-way
    (error below f32 eps) while the host matrices stay 2-way — the same
    constants, DMA traffic, and VMEM footprint as passes=4. The five
    kept terms (hi@Mhi; hi@Mlo, mid@Mhi; mid@Mlo, lo@Mhi) cover every
    product of magnitude >= 2^-18 relative; the remaining error is the
    matrices' own 2-way representation floor (~2^-18), which the offline
    battery puts at 6.2e-4 dB unrestricted vs passes=4's 1.06e-3 — the
    u-representation error the 2-way split left on the table was the
    larger half of the pass-4 error (per-class attribution in the r5
    notes). +25% DFT MXU work vs passes=4 and none of passes=6's
    1.5x constant traffic.

    passes=6 keeps every cross term of magnitude >= 2^-16 relative
    (hi@hi; hi@mid, mid@hi; hi@lo, lo@hi, mid@mm) against 3-way-split
    matrices — the dropped mid@lo/lo@mid (~2^-24) and lo@lo (~2^-32) sit
    at or below the f32 epsilon of the result, so this is f32-equivalent
    DFT accuracy at six bf16 MXU passes (+50% DFT work vs passes=4;
    costed on-chip, VERDICT r3 #4)."""
    if passes >= 6:
        hi, mid, lo = parts
        mhi, mmid, mlo = m_ref[0], m_ref[1], m_ref[2]
        return (_dot_bf16(hi, mhi) + _dot_bf16(hi, mmid) + _dot_bf16(mid, mhi)
                + _dot_bf16(hi, mlo) + _dot_bf16(lo, mhi)
                + _dot_bf16(mid, mmid))
    if passes == 5:
        hi, mid, lo = parts
        mhi, mlo = m_ref[0], m_ref[1]
        return (_dot_bf16(hi, mhi) + _dot_bf16(hi, mlo) + _dot_bf16(mid, mhi)
                + _dot_bf16(mid, mlo) + _dot_bf16(lo, mhi))
    return _dot_hilo(parts[0], parts[1], m_ref, passes)


def _dot_mel(power, fb_ref):
    """3-pass bf16 mel projection against a hi/lo-split filterbank.

    power (spectral magnitudes) and the mel filterbank are both
    NONNEGATIVE, so there is no cancellation anywhere in the sum: each
    bf16 representation error is elementwise-relative (~2^-18 after the
    hi/lo split) and stays relative per MEL bin — ~5e-5 dB even at floor
    bins, an order below the DFT passes' own floor. Half the MXU work of
    the Precision.HIGHEST f32 dot this replaces (measured: the swap pays
    for the 5th DFT pass of the dft_passes=5 production mode and more)."""
    p_hi = power.astype(jnp.bfloat16)
    p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return _dot_hilo(p_hi, p_lo, fb_ref, 3)


def _kernel_radix2(e_ref, o_ref, ce_ref, se_ref, co_ref, so_ref,
                   cj_ref, sj_ref, fblo_ref, fbhi_ref, out_ref, *,
                   passes: int = 3):
    """Grid: (row_tiles,). All constants have grid-invariant block indices,
    so Pallas DMAs them into VMEM exactly once — unlike the f-tiled kernels
    whose DFT-matrix streaming dominated their runtime."""
    e = e_ref[:]
    o = o_ref[:]
    e_hi = e.astype(jnp.bfloat16)
    e_lo = (e - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    o_hi = o.astype(jnp.bfloat16)
    o_lo = (o - o_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot4(x_hi, x_lo, m_ref):
        return _dot_hilo(x_hi, x_lo, m_ref, passes)

    p = dot4(e_hi, e_lo, ce_ref)
    q = dot4(e_hi, e_lo, se_ref)
    r = dot4(o_hi, o_lo, co_ref)
    t = dot4(o_hi, o_lo, so_ref)
    c = cj_ref[:]  # (1, nb_pad), broadcasts over rows
    s = sj_ref[:]
    cr = c * r
    st = s * t
    ct = c * t
    sr = s * r
    re_lo = p + cr - st
    im_lo = q + ct + sr
    re_hi = p - cr + st
    im_hi = q - ct - sr
    power_lo = re_lo * re_lo + im_lo * im_lo
    power_hi = re_hi * re_hi + im_hi * im_hi
    mel = _dot_f32(power_lo, fblo_ref[:]) + _dot_f32(power_hi, fbhi_ref[:])
    out_ref[:] = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def _vmem_frames(x, t_pad: int, hh: int, pieces: int):
    """In-VMEM framing of a (1, need) sample-stream lane vector: frame f is
    the hh-sized chunks f..f+pieces-1, assembled as `pieces` lane-aligned
    slices reshaped to (t_pad, hh) and lane-concatenated. Sublane-shifted
    slices would be the natural phrasing but Mosaic rejects their concat
    ("offset mismatch on non-concat dimension"); lane-offset slices at
    hh % 128 == 0 are relayout-free."""
    return jnp.concatenate(
        [jnp.reshape(x[:, s * hh : (s + t_pad) * hh], (t_pad, hh))
         for s in range(pieces)],
        axis=1,
    )


def _fused_epilogue(db, t: int, n_mels: int, normalize: bool,
                    top_db: float | None, eps: float, bounds=None):
    """Per-example epilogue on a (t_pad, m_pad) dB block: top_db clip
    against the example peak, optional SpecAugment masking, and
    zero-mean/unit-var normalize (ops.mel.normalize_spectrogram semantics),
    masked to the valid (t, n_mels) region. Variance is unbiased (ddof=1)
    to match torch.std.

    bounds, when given, is this example's (f_start, f_width, t_start,
    t_width) f32 vector (ops.augment.spec_mask_bounds): cells with
    start <= idx < start + width on either axis are zeroed BETWEEN the dB
    stage and normalize — the reference's augmentation ordering
    (preprocessing.py:105-116: mel -> dB -> spec-aug -> normalize), so the
    normalize statistics include the masked zeros exactly as the unfused
    chain's do."""
    if top_db is None and not normalize and bounds is None:
        return db
    rows = jax.lax.broadcasted_iota(jnp.int32, db.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
    valid = (rows < t) & (cols < n_mels)
    if top_db is not None:
        peak = jnp.max(jnp.where(valid, db, -jnp.inf))
        db = jnp.maximum(db, peak - top_db)
    if bounds is not None:
        f_start, f_width, t_start, t_width = (bounds[i] for i in range(4))
        fidx = cols.astype(jnp.float32)  # rows = time, cols = mel: the
        tidx = rows.astype(jnp.float32)  # kernel block is (t_pad, m_pad)
        masked = ((fidx >= f_start) & (fidx < f_start + f_width)) | (
            (tidx >= t_start) & (tidx < t_start + t_width)
        )
        db = jnp.where(masked, 0.0, db)
    if normalize:
        n = t * n_mels
        mean = jnp.sum(jnp.where(valid, db, 0.0)) / n
        centered = jnp.where(valid, db - mean, 0.0)
        var = jnp.sum(centered * centered) / max(n - 1, 1)
        db = (db - mean) / (jnp.sqrt(var) + eps)
    return db


def _kernel_radix2_fused(weo_ref, ce_ref, se_ref, co_ref, so_ref,
                         cj_ref, sj_ref, fblo_ref, fbhi_ref, *refs,
                         t: int, t_pad: int, pieces: int, hh: int, n_mels: int,
                         normalize: bool, top_db: float | None, eps: float,
                         passes: int = 3, with_masks: bool = False):
    """Grid: (B,) — one whole example per cell.

    Framing happens IN VMEM (_vmem_frames over the example's even/odd
    sample streams at hh = hop/2), so frame overlap never materializes the
    (B*T, n_fft) frames tensor in HBM (~4x the waveform at hop = n_fft/4).
    Because the full example's mel lives in VMEM, the per-example epilogue
    (_fused_epilogue) fuses here too, instead of costing extra HBM passes
    after the kernel. with_masks threads a per-example SpecAugment bounds
    vector (SMEM) into the epilogue so the AUGMENTED training path fuses
    end-to-end as well (VERDICT r2 #8).
    """
    if with_masks:
        mb_ref, out_ref = refs
    else:
        (out_ref,) = refs
        mb_ref = None
    # weo_ref: (2, 1, need) — both parity streams in ONE operand (single
    # XLA transpose host-side; see _kernel_radix4_fused on why separate
    # strided-slice streams cost a full serialized HBM pass each, and why
    # streams ride the leading block dim)
    we = weo_ref[0]  # (1, (t_pad + pieces - 1) * hh) even samples
    wo = weo_ref[1]

    e = _vmem_frames(we, t_pad, hh, pieces)
    o = _vmem_frames(wo, t_pad, hh, pieces)
    e_hi = e.astype(jnp.bfloat16)
    e_lo = (e - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    o_hi = o.astype(jnp.bfloat16)
    o_lo = (o - o_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot4(x_hi, x_lo, m_ref):
        return _dot_hilo(x_hi, x_lo, m_ref, passes)

    p = dot4(e_hi, e_lo, ce_ref)
    q = dot4(e_hi, e_lo, se_ref)
    r = dot4(o_hi, o_lo, co_ref)
    w = dot4(o_hi, o_lo, so_ref)
    c = cj_ref[:]
    s = sj_ref[:]
    cr = c * r
    st = s * w
    ct = c * w
    sr = s * r
    re_lo = p + cr - st
    im_lo = q + ct + sr
    re_hi = p - cr + st
    im_hi = q - ct - sr
    power_lo = re_lo * re_lo + im_lo * im_lo
    power_hi = re_hi * re_hi + im_hi * im_hi
    mel = _dot_f32(power_lo, fblo_ref[:]) + _dot_f32(power_hi, fbhi_ref[:])
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    bounds = None if mb_ref is None else tuple(mb_ref[0, 0, i] for i in range(4))
    out_ref[0] = _fused_epilogue(db, t, n_mels, normalize, top_db, eps, bounds)


def _log_mel_radix2_fused(waveform, sample_rate, n_fft, hop_length, n_mels,
                          mel_scale, norm, interpret: bool,
                          f_min: float = 0.0, f_max: float | None = None,
                          top_db: float | None = None,
                          normalize: bool = False, eps: float = 1e-8,
                          dft_passes: int = 3, spec_mask_bounds=None):
    if n_fft % hop_length:
        raise ValueError("radix2_fused requires n_fft divisible by hop_length")
    if (hop_length // 2) % 128:
        # in-kernel framing slices the sample streams at hop/2 lane offsets;
        # Mosaic needs those 128-aligned (production 2048/512 -> hh=256 ok)
        raise ValueError("radix2_fused requires hop_length % 256 == 0")
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    pieces = n_fft // hop_length
    hh = hop_length // 2
    t_pad = _round_up(t, 8)
    rows_in = t_pad + pieces - 1
    need = rows_in * hh
    # torch.stft center=True semantics: reflect-pad n_fft//2 each side (even,
    # so frame parity alignment survives the shift).
    x = stft_ops.reflect_pad(waveform, n_fft // 2)
    if x.shape[-1] % 2:
        x = jnp.pad(x, ((0, 0), (0, 1)))
    # Even/odd de-interleave as ONE (b, 2, need) transpose (see the radix-4
    # wrapper: per-stream strided slices each re-read the waveform in HBM)
    half = x.reshape(b, x.shape[-1] // 2, 2)
    ht = jnp.swapaxes(half, 1, 2)  # (b, 2, L/2)
    if need > ht.shape[-1]:
        ht = jnp.pad(ht, ((0, 0), (0, 0), (0, need - ht.shape[-1])))
    weo = ht[:, :, :need].reshape(b * 2, 1, need)  # row 2*i + parity

    ce, se, co, so, cj, sj, fb_lo, fb_hi = _constants_radix2(
        sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max
    )
    h = n_fft // 2
    nb_pad = ce.shape[2]
    m_pad = fb_lo.shape[1]

    const3 = lambda: pl.BlockSpec((2, h, nb_pad), lambda bi: (0, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    const2 = lambda shp: pl.BlockSpec(shp, lambda bi: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((2, 1, need), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        const3(), const3(), const3(), const3(),
        const2((1, nb_pad)), const2((1, nb_pad)),
        const2((nb_pad, m_pad)), const2((nb_pad, m_pad)),
    ]
    extra = ()
    if spec_mask_bounds is not None:
        # (b, 1, 4): SMEM blocks must equal the array on the last two dims
        # (the (8, 128) tiling rule applies to SMEM blocks too), so the
        # per-cell bounds ride the leading dim
        in_specs.append(pl.BlockSpec((1, 1, 4), lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.SMEM))
        extra = (spec_mask_bounds.astype(jnp.float32).reshape(b, 1, 4),)
    out = pl.pallas_call(
        functools.partial(
            _kernel_radix2_fused, t=t, t_pad=t_pad, pieces=pieces, hh=hh,
            n_mels=n_mels, normalize=normalize, top_db=top_db, eps=eps,
            passes=dft_passes, with_masks=spec_mask_bounds is not None,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t_pad, m_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        # constants alone are ~11 MB (4 bf16 hi/lo DFT matrices); with the
        # per-example intermediates the worst-case stack lands just past the
        # default 16 MB scoped-vmem budget on 5 s clips
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(weo, *(jnp.asarray(x) for x in (ce, se, co, so, cj, sj, fb_lo, fb_hi)),
      *extra)
    return jnp.swapaxes(out[:, :t, :n_mels], 1, 2)  # (B, n_mels, T)


def _kernel_radix4_fused(wq_ref,
                         c0_ref, s0_ref, c1_ref, s1_ref,
                         c2_ref, s2_ref, c3_ref, s3_ref,
                         tw_ref, fbs_ref, *refs,
                         t: int, t_pad: int, pieces: int, hh: int, n_mels: int,
                         normalize: bool, top_db: float | None, eps: float,
                         passes: int = 3, group: int = 1,
                         with_masks: bool = False):
    """Grid: (B/group,) — `group` whole examples per cell, radix-4 DFT.

    Same in-VMEM framing and per-example epilogue as _kernel_radix2_fused,
    but over FOUR mod-4 sample streams (hh = hop/4 per-stream hop, 128-lane
    aligned at hop % 512 == 0), so the dense DFT matmuls are quarter-size
    (8 x (t, q)@(q, nb4) vs the full DFT's (t, n_fft)@(n_fft, n_fft/2+1)).
    The 1025-bin power spectrum is rebuilt in four regions from host-side
    twiddle vectors; conjugate symmetry rides in the region constants and
    pre-permuted mel matrices (_constants_radix4), so no in-kernel lane
    reversal is needed. group > 1 processes several examples per grid cell
    (sequentially, per-example epilogue intact), shortening the grid and
    amortizing per-cell setup — measured within noise (+0.3-1%) at batch
    128, never worse.
    """
    if with_masks:
        mb_ref, out_ref = refs
    else:
        (out_ref,) = refs
        mb_ref = None
    tw = tw_ref[:]
    # The group's examples stack along the row axis, so every dot in the
    # cell runs ONCE at (group * t_pad) rows instead of `group` times at
    # t_pad rows — deeper MXU pipelines, 8 matmuls per cell regardless of
    # group, and the row-parallel recombination amortizes the same way.
    P = []
    Q = []
    for j, (cref, sref) in enumerate(((c0_ref, s0_ref), (c1_ref, s1_ref),
                                      (c2_ref, s2_ref), (c3_ref, s3_ref))):
        # wq_ref: (group * 4, 1, need), row 4*g + j = stream j of group
        # example g — all four mod-4 streams arrive as ONE operand (a single
        # XLA transpose + reshape host-side) instead of four strided-slice
        # materializations that each re-read the whole waveform from HBM
        # (measured: that prep serialized ~4 ms against the kernel's 5.8 ms
        # at batch 512 — the entire batch-512 knee). Streams stay on the
        # LEADING block dim: a leading-dim index is free, while slicing the
        # sublane dim of a (4, need) block stalls the Mosaic compiler.
        fr = jnp.concatenate(
            [_vmem_frames(wq_ref[g * 4 + j], t_pad, hh, pieces)
             for g in range(group)],
            axis=0,
        )  # (group * t_pad, q)
        f_hi = fr.astype(jnp.bfloat16)
        f_lo = (fr - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        P.append(_dot_hilo(f_hi, f_lo, cref, passes))
        Q.append(_dot_hilo(f_hi, f_lo, sref, passes))

    mel = None
    for r in range(4):
        conj = r in (1, 3)
        # j = 0 term: twiddle is 1 (S_0 enters directly)
        re = P[0]
        im = Q[0] if conj else -Q[0]
        for j in (1, 2, 3):
            c = tw[r * 6 + (j - 1), :]
            s = tw[r * 6 + 3 + (j - 1), :]
            if conj:  # t_j(k) * conj(S_j) with t = c - i*s, S = P - i*Q
                re = re + c * P[j] + s * Q[j]
                im = im + c * Q[j] - s * P[j]
            else:     # t_j(k) * S_j
                re = re + c * P[j] - s * Q[j]
                im = im - c * Q[j] - s * P[j]
        power = re * re + im * im
        part = _dot_f32(power, fbs_ref[r])
        mel = part if mel is None else mel + part

    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # epilogue stays strictly per-example: each example's clip/normalize
    # statistics come from its own rows alone (pinned by the
    # grouped-vs-ungrouped isolation test)
    for g in range(group):
        bounds = None if mb_ref is None else tuple(
            mb_ref[0, 0, g * 4 + i] for i in range(4))
        out_ref[g] = _fused_epilogue(
            db[g * t_pad : (g + 1) * t_pad], t, n_mels, normalize, top_db, eps,
            bounds,
        )


def _log_mel_radix4_fused(waveform, sample_rate, n_fft, hop_length, n_mels,
                          mel_scale, norm, interpret: bool,
                          f_min: float = 0.0, f_max: float | None = None,
                          top_db: float | None = None,
                          normalize: bool = False, eps: float = 1e-8,
                          dft_passes: int = 3, spec_mask_bounds=None):
    if n_fft % 8:
        raise ValueError("radix4_fused requires n_fft divisible by 8")
    if n_fft % hop_length:
        raise ValueError("radix4_fused requires n_fft divisible by hop_length")
    if (hop_length // 4) % 128:
        # per-stream framing slices at hop/4 lane offsets; Mosaic needs them
        # 128-aligned (production 2048/512 -> hh=128 ok)
        raise ValueError("radix4_fused requires hop_length % 512 == 0")
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    pieces = n_fft // hop_length
    hh = hop_length // 4
    t_pad = _round_up(t, 8)
    rows_in = t_pad + pieces - 1
    need = rows_in * hh
    # torch.stft center=True semantics; n_fft//2 % 4 == 0 so stream parity
    # alignment survives the shift.
    x = stft_ops.reflect_pad(waveform, n_fft // 2)
    if x.shape[-1] % 4:
        x = jnp.pad(x, ((0, 0), (0, 4 - x.shape[-1] % 4)))
    # One (b, 4, need) operand via a single transpose: de-interleaving into
    # four separate (b, need) streams made XLA materialize four
    # strided-slice copies, each re-reading the full waveform — measured as
    # the whole batch-512 throughput knee (~4 ms serialized against a
    # 5.8 ms kernel). The transpose reads + writes the waveform once.
    quarter = x.reshape(b, x.shape[-1] // 4, 4)
    qt = jnp.swapaxes(quarter, 1, 2)  # (b, 4, L/4)
    qlen = qt.shape[-1]
    if need > qlen:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, need - qlen)))
    # (b*4, 1, need): row 4*i + j = stream j of example i — the kernel
    # indexes streams on the leading block dim (sublane slicing stalls
    # Mosaic)
    streams = qt[:, :, :need].reshape(b * 4, 1, need)

    dft, tw, fbs = _constants_radix4(
        sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max
    )
    q = n_fft // 4
    nb_pad = dft[0].shape[2]
    m_pad = fbs.shape[2]

    # several examples per grid cell shorten the grid and overlap DMA with
    # compute; measured neutral-to-slightly-positive (+0.3-1% at batch 128)
    group = next(g for g in (4, 2, 1) if b % g == 0)
    const3 = lambda: pl.BlockSpec((2, q, nb_pad), lambda bi: (0, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((group * 4, 1, need), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        *[const3() for _ in range(8)],
        pl.BlockSpec((24, nb_pad), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, nb_pad, m_pad), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    extra = ()
    if spec_mask_bounds is not None:
        # (b//group, 1, group*4): SMEM blocks must equal the array on the
        # last two dims (the (8, 128) tiling rule applies to SMEM too), so
        # each cell's group of bounds rides the leading dim
        in_specs.append(pl.BlockSpec((1, 1, group * 4),
                                     lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.SMEM))
        extra = (spec_mask_bounds.astype(jnp.float32)
                 .reshape(b // group, 1, group * 4),)
    out = pl.pallas_call(
        functools.partial(
            _kernel_radix4_fused, t=t, t_pad=t_pad, pieces=pieces, hh=hh,
            n_mels=n_mels, normalize=normalize, top_db=top_db, eps=eps,
            passes=dft_passes, group=group,
            with_masks=spec_mask_bounds is not None,
        ),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, t_pad, m_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(streams, *(jnp.asarray(x) for x in dft),
      jnp.asarray(tw), jnp.asarray(fbs), *extra)
    return jnp.swapaxes(out[:, :t, :n_mels], 1, 2)  # (B, n_mels, T)


def _kernel_radix4dif_fused(x_ref, c0_ref, s0_ref, c1_ref, s1_ref,
                            c2_ref, s2_ref, wtw_ref,
                            fa_ref, fbm_ref, fc_ref, *refs,
                            t: int, t_pad: int, pieces: int, hop: int,
                            n_mels: int, normalize: bool,
                            top_db: float | None, eps: float,
                            passes: int = 3, group: int = 1,
                            with_masks: bool = False):
    """Grid: (B/group,) — radix-4 DIF (see _constants_radix4dif).

    x_ref is (group, 1, need): the example's reflect-padded waveform rows,
    CONTIGUOUS — framing happens in VMEM at hh = hop (lane-aligned for
    hop % 128 == 0), quarter blocks are plain lane slices, and the wrapper
    does no stream de-interleave at all (the radix-4 DIT kernels' prep
    cost, measured as the entire batch-512 knee)."""
    if with_masks:
        mb_ref, out_ref = refs
    else:
        (out_ref,) = refs
        mb_ref = None
    q = c1_ref.shape[1]

    fr = jnp.concatenate(
        [_vmem_frames(x_ref[g], t_pad, hop, pieces) for g in range(group)],
        axis=0,
    )  # (group * t_pad, n_fft)
    wa = wtw_ref[0]
    wb = wtw_ref[1]
    wc = wtw_ref[2]
    wd = wtw_ref[3]
    c1 = wtw_ref[4]
    s1 = wtw_ref[5]
    a = fr[:, 0:q] * wa
    b = fr[:, q:2 * q] * wb
    c = fr[:, 2 * q:3 * q] * wc
    d = fr[:, 3 * q:4 * q] * wd
    u0 = (a + c) + (b + d)
    u2 = (a + c) - (b + d)
    p = a - c
    qd = b - d
    v1r = p * c1 - qd * s1
    v1i = -(p * s1 + qd * c1)

    def split(x):
        hi = x.astype(jnp.bfloat16)
        return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    u0h, u0l = split(u0)
    u2h, u2l = split(u2)
    vrh, vrl = split(v1r)
    vih, vil = split(v1i)

    re_a = _dot_hilo(u0h, u0l, c0_ref, passes)
    im_a = _dot_hilo(u0h, u0l, s0_ref, passes)
    re_b = _dot_hilo(vrh, vrl, c1_ref, passes) + _dot_hilo(vih, vil, s1_ref, passes)
    im_b = _dot_hilo(vih, vil, c1_ref, passes) - _dot_hilo(vrh, vrl, s1_ref, passes)
    re_c = _dot_hilo(u2h, u2l, c2_ref, passes)
    im_c = _dot_hilo(u2h, u2l, s2_ref, passes)

    mel = (
        _dot_f32(re_a * re_a + im_a * im_a, fa_ref[:])
        + _dot_f32(re_b * re_b + im_b * im_b, fbm_ref[:])
        + _dot_f32(re_c * re_c + im_c * im_c, fc_ref[:])
    )
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    for g in range(group):
        bounds = None if mb_ref is None else tuple(
            mb_ref[0, 0, g * 4 + i] for i in range(4))
        out_ref[g] = _fused_epilogue(
            db[g * t_pad:(g + 1) * t_pad], t, n_mels, normalize, top_db, eps,
            bounds,
        )


def _log_mel_radix4dif_fused(waveform, sample_rate, n_fft, hop_length, n_mels,
                             mel_scale, norm, interpret: bool,
                             f_min: float = 0.0, f_max: float | None = None,
                             top_db: float | None = None,
                             normalize: bool = False, eps: float = 1e-8,
                             dft_passes: int = 3, spec_mask_bounds=None):
    if n_fft % 8:
        raise ValueError("radix4dif_fused requires n_fft divisible by 8")
    if n_fft % hop_length:
        raise ValueError("radix4dif_fused requires n_fft divisible by hop_length")
    if hop_length % 128:
        # in-VMEM framing slices the padded waveform at hop lane offsets
        raise ValueError("radix4dif_fused requires hop_length % 128 == 0")
    if (n_fft // 4) % 128:
        # quarter blocks are lane slices at n_fft/4 offsets
        raise ValueError("radix4dif_fused requires n_fft % 512 == 0")
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    pieces = n_fft // hop_length
    t_pad = _round_up(t, 8)
    need = (t_pad + pieces - 1) * hop_length
    # torch.stft center=True semantics. The ONLY host-side prep is this
    # reflect pad — no de-interleave, no transpose.
    x = stft_ops.reflect_pad(waveform, n_fft // 2)
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    x = x[:, :need].reshape(b, 1, need)

    dft, wtw, fbs = _constants_radix4dif(
        sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max
    )
    q = n_fft // 4
    nb0_pad = dft[0].shape[2]
    m_pad = fbs[0].shape[1]
    group = next(g for g in (4, 2, 1) if b % g == 0)

    def const3(cols):
        return pl.BlockSpec((2, q, cols), lambda bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def fbspec(rows):
        return pl.BlockSpec((rows, m_pad), lambda bi: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((group, 1, need), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        const3(nb0_pad), const3(nb0_pad),  # C0, S0
        const3(q), const3(q),              # C1, S1
        const3(q // 2), const3(q // 2),    # C2, S2
        pl.BlockSpec((6, 1, q), lambda bi: (0, 0, 0), memory_space=pltpu.VMEM),
        fbspec(nb0_pad), fbspec(q), fbspec(q // 2),
    ]
    extra = ()
    if spec_mask_bounds is not None:
        # (b//group, 1, group*4): SMEM blocks must equal the array on the
        # last two dims (the (8, 128) tiling rule applies to SMEM too), so
        # each cell's group of bounds rides the leading dim
        in_specs.append(pl.BlockSpec((1, 1, group * 4),
                                     lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.SMEM))
        extra = (spec_mask_bounds.astype(jnp.float32)
                 .reshape(b // group, 1, group * 4),)
    out = pl.pallas_call(
        functools.partial(
            _kernel_radix4dif_fused, t=t, t_pad=t_pad, pieces=pieces,
            hop=hop_length, n_mels=n_mels, normalize=normalize, top_db=top_db,
            eps=eps, passes=dft_passes, group=group,
            with_masks=spec_mask_bounds is not None,
        ),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, t_pad, m_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *(jnp.asarray(y) for y in dft), jnp.asarray(wtw),
      *(jnp.asarray(y) for y in fbs), *extra)
    return jnp.swapaxes(out[:, :t, :n_mels], 1, 2)  # (B, n_mels, T)


def _kernel_radix8dif_fused(x_ref, c0_ref, s0_ref, c4_ref, s4_ref,
                            c1_ref, s1_ref, c2_ref, s2_ref, c3_ref, s3_ref,
                            wtw_ref, f0_ref, f4_ref, f1_ref, f2_ref, f3_ref,
                            *refs,
                            t: int, t_pad: int, pieces: int, hop: int,
                            n_mels: int, normalize: bool,
                            top_db: float | None, eps: float,
                            passes: int = 5, group: int = 1,
                            with_masks: bool = False):
    """Grid: (B/group,) — radix-8 DIF (see _constants_radix8dif).

    Same contiguous-frame structure as _kernel_radix4dif_fused one
    decimation level deeper: eight windowed eighth-blocks, 0/±1/±sqrt(.5)
    VPU butterflies into five sequences (u0, u4 real; u1, u2, u3 complex),
    sixteen quarter-K DFT matmuls against twiddle-folded host constants,
    five pre-permuted mel matmuls, fused per-example epilogue."""
    if with_masks:
        mb_ref, out_ref = refs
    else:
        (out_ref,) = refs
        mb_ref = None
    e = c1_ref.shape[1]
    h = 0.7071067811865476  # sqrt(1/2): the only non-unit |W_8| coefficient

    fr = jnp.concatenate(
        [_vmem_frames(x_ref[g], t_pad, hop, pieces) for g in range(group)],
        axis=0,
    )  # (group * t_pad, n_fft)
    b = [fr[:, j * e:(j + 1) * e] * wtw_ref[j] for j in range(8)]
    ev = (b[0] + b[4]) + (b[2] + b[6])
    od = (b[1] + b[5]) + (b[3] + b[7])
    u0 = ev + od
    u4 = ev - od
    d04 = b[0] - b[4]
    d26 = b[2] - b[6]
    s17 = b[1] + b[7]
    s35 = b[3] + b[5]
    hi_shared = h * ((b[5] + b[7]) - (b[1] + b[3]))
    u1r = d04 + h * (s17 - s35)
    u1i = hi_shared - d26
    u2r = (b[0] + b[4]) - (b[2] + b[6])
    u2i = (b[3] + b[7]) - (b[1] + b[5])
    u3r = d04 + h * (s35 - s17)
    u3i = hi_shared + d26

    u0p = _split_parts(u0, passes)
    u4p = _split_parts(u4, passes)

    def cplx(ur, ui, c_ref, s_ref):
        urp = _split_parts(ur, passes)
        uip = _split_parts(ui, passes)
        re = _dot_parts(urp, c_ref, passes) - _dot_parts(uip, s_ref, passes)
        im = _dot_parts(urp, s_ref, passes) + _dot_parts(uip, c_ref, passes)
        return re * re + im * im

    re0 = _dot_parts(u0p, c0_ref, passes)
    im0 = _dot_parts(u0p, s0_ref, passes)
    re4 = _dot_parts(u4p, c4_ref, passes)
    im4 = _dot_parts(u4p, s4_ref, passes)

    mel = (
        _dot_mel(re0 * re0 + im0 * im0, f0_ref)
        + _dot_mel(re4 * re4 + im4 * im4, f4_ref)
        + _dot_mel(cplx(u1r, u1i, c1_ref, s1_ref), f1_ref)
        + _dot_mel(cplx(u2r, u2i, c2_ref, s2_ref), f2_ref)
        + _dot_mel(cplx(u3r, u3i, c3_ref, s3_ref), f3_ref)
    )
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    for g in range(group):
        bounds = None if mb_ref is None else tuple(
            mb_ref[0, 0, g * 4 + i] for i in range(4))
        out_ref[g] = _fused_epilogue(
            db[g * t_pad:(g + 1) * t_pad], t, n_mels, normalize, top_db, eps,
            bounds,
        )


def _kernel_radix16dif_fused(x_ref, *refs,
                             t: int, t_pad: int, pieces: int, hop: int,
                             n_mels: int, normalize: bool,
                             top_db: float | None, eps: float,
                             passes: int = 5, group: int = 1,
                             with_masks: bool = False):
    """Grid: (B/group,) — radix-16 DIF (see _constants_radix16dif).

    Same contiguous-frame structure as _kernel_radix8dif_fused one level
    deeper: sixteen windowed sixteenth-blocks, a two-stage butterfly
    (a_j = b_j + b_{j+8} through the radix-8 combinations for even
    classes; d_j = b_j - b_{j+8} with W_16 scalar coefficients for odd),
    thirty quarter-K DFT matmuls against twiddle-folded host constants,
    nine pre-permuted mel matmuls, fused per-example epilogue.

    refs layout: C0,S0, C8,S8, C1,S1..C7,S7 (18), wtw, F0,F8,F1..F7 (9),
    [mask bounds], out."""
    dft_refs = refs[:18]
    wtw_ref = refs[18]
    fb_refs = refs[19:28]
    rest = refs[28:]
    if with_masks:
        mb_ref, out_ref = rest
    else:
        (out_ref,) = rest
        mb_ref = None
    c0_ref, s0_ref, c8_ref, s8_ref = dft_refs[:4]
    s = dft_refs[4].shape[1]  # sixteenth-block width (C1 is (s, s))
    h = 0.7071067811865476

    fr = jnp.concatenate(
        [_vmem_frames(x_ref[g], t_pad, hop, pieces) for g in range(group)],
        axis=0,
    )  # (group * t_pad, n_fft)
    b = [fr[:, j * s:(j + 1) * s] * wtw_ref[j] for j in range(16)]
    a = [b[j] + b[j + 8] for j in range(8)]
    d = [b[j] - b[j + 8] for j in range(8)]

    # even classes: the radix-8 butterfly on a_j
    ev = (a[0] + a[4]) + (a[2] + a[6])
    od = (a[1] + a[5]) + (a[3] + a[7])
    u0 = ev + od
    u8 = ev - od
    d04 = a[0] - a[4]
    d26 = a[2] - a[6]
    s17 = a[1] + a[7]
    s35 = a[3] + a[5]
    hi_shared = h * ((a[5] + a[7]) - (a[1] + a[3]))
    evens = {
        2: (d04 + h * (s17 - s35), hi_shared - d26),
        4: ((a[0] + a[4]) - (a[2] + a[6]), (a[3] + a[7]) - (a[1] + a[5])),
        6: (d04 + h * (s35 - s17), hi_shared + d26),
    }
    # odd classes: u_r = sum_j W_16^{rj} d_j with scalar f32 coefficients
    # (exact region math pinned vs rfft in the derivation; the ~1e-16
    # rounding of the traced constants is far below the bf16 pass floor)
    import math as _math

    odds = {}
    for r in (1, 3, 5, 7):
        ur = ui = None
        for j in range(8):
            c = _math.cos(_math.pi * r * j / 8)
            si = _math.sin(_math.pi * r * j / 8)
            if abs(c) > 1e-12:
                term = d[j] if abs(c - 1.0) < 1e-12 else c * d[j]
                ur = term if ur is None else ur + term
            if abs(si) > 1e-12:
                term = d[j] if abs(si - 1.0) < 1e-12 else si * d[j]
                ui = term if ui is None else ui + term
        odds[r] = (ur, -ui)

    def cplx(ur, ui, c_ref, s_ref):
        urp = _split_parts(ur, passes)
        uip = _split_parts(ui, passes)
        re = _dot_parts(urp, c_ref, passes) - _dot_parts(uip, s_ref, passes)
        im = _dot_parts(urp, s_ref, passes) + _dot_parts(uip, c_ref, passes)
        return re * re + im * im

    u0p = _split_parts(u0, passes)
    u8p = _split_parts(u8, passes)
    re0 = _dot_parts(u0p, c0_ref, passes)
    im0 = _dot_parts(u0p, s0_ref, passes)
    re8 = _dot_parts(u8p, c8_ref, passes)
    im8 = _dot_parts(u8p, s8_ref, passes)

    mel = (_dot_mel(re0 * re0 + im0 * im0, fb_refs[0])
           + _dot_mel(re8 * re8 + im8 * im8, fb_refs[1]))
    for i, r in enumerate(range(1, 8)):
        ur, ui = odds[r] if r % 2 else evens[r]
        mel = mel + _dot_mel(
            cplx(ur, ui, dft_refs[4 + 2 * i], dft_refs[5 + 2 * i]),
            fb_refs[2 + i],
        )
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    for g in range(group):
        bounds = None if mb_ref is None else tuple(
            mb_ref[0, 0, g * 4 + i] for i in range(4))
        out_ref[g] = _fused_epilogue(
            db[g * t_pad:(g + 1) * t_pad], t, n_mels, normalize, top_db, eps,
            bounds,
        )


def _log_mel_radix16dif_fused(waveform, sample_rate, n_fft, hop_length, n_mels,
                              mel_scale, norm, interpret: bool,
                              f_min: float = 0.0, f_max: float | None = None,
                              top_db: float | None = None,
                              normalize: bool = False, eps: float = 1e-8,
                              dft_passes: int = 5, spec_mask_bounds=None):
    if n_fft % 16:
        raise ValueError("radix16dif_fused requires n_fft divisible by 16")
    if n_fft % hop_length:
        raise ValueError("radix16dif_fused requires n_fft divisible by hop_length")
    if hop_length % 128:
        raise ValueError("radix16dif_fused requires hop_length % 128 == 0")
    if (n_fft // 16) % 128:
        # sixteenth blocks are lane slices at n_fft/16 offsets
        raise ValueError("radix16dif_fused requires n_fft % 2048 == 0")
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    pieces = n_fft // hop_length
    t_pad = _round_up(t, 8)
    need = (t_pad + pieces - 1) * hop_length
    x = stft_ops.reflect_pad(waveform, n_fft // 2)
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    x = x[:, :need].reshape(b, 1, need)

    comp = 3 if dft_passes >= 6 else 2
    dft, wtw, fbs = _constants_radix16dif(
        sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max,
        components=comp,
    )
    s = n_fft // 16
    nb0_pad = dft[0].shape[2]
    m_pad = fbs[0].shape[2]
    group = next(g for g in (4, 2, 1) if b % g == 0)

    def const(cols):
        return pl.BlockSpec((comp, s, cols), lambda bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def fbspec(rows):
        # hi/lo-split mel matrix for the 3-pass bf16 projection (_dot_mel)
        return pl.BlockSpec((2, rows, m_pad), lambda bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((group, 1, need), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        const(nb0_pad), const(nb0_pad),    # C0, S0
        const(s // 2), const(s // 2),      # C8, S8
    ]
    for _ in range(1, 8):                  # C1..C7, S1..S7
        in_specs += [const(s), const(s)]
    in_specs.append(
        pl.BlockSpec((16, 1, s), lambda bi: (0, 0, 0), memory_space=pltpu.VMEM)
    )
    in_specs += [fbspec(nb0_pad), fbspec(s // 2)] + [fbspec(s)] * 7
    extra = ()
    if spec_mask_bounds is not None:
        in_specs.append(pl.BlockSpec((1, 1, group * 4),
                                     lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.SMEM))
        extra = (spec_mask_bounds.astype(jnp.float32)
                 .reshape(b // group, 1, group * 4),)
    out = pl.pallas_call(
        functools.partial(
            _kernel_radix16dif_fused, t=t, t_pad=t_pad, pieces=pieces,
            hop=hop_length, n_mels=n_mels, normalize=normalize, top_db=top_db,
            eps=eps, passes=dft_passes, group=group,
            with_masks=spec_mask_bounds is not None,
        ),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, t_pad, m_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *(jnp.asarray(y) for y in dft), jnp.asarray(wtw),
      *(jnp.asarray(y) for y in fbs), *extra)
    return jnp.swapaxes(out[:, :t, :n_mels], 1, 2)  # (B, n_mels, T)


def _log_mel_radix8dif_fused(waveform, sample_rate, n_fft, hop_length, n_mels,
                             mel_scale, norm, interpret: bool,
                             f_min: float = 0.0, f_max: float | None = None,
                             top_db: float | None = None,
                             normalize: bool = False, eps: float = 1e-8,
                             dft_passes: int = 5, spec_mask_bounds=None):
    if n_fft % 8:
        raise ValueError("radix8dif_fused requires n_fft divisible by 8")
    if n_fft % hop_length:
        raise ValueError("radix8dif_fused requires n_fft divisible by hop_length")
    if hop_length % 128:
        # in-VMEM framing slices the padded waveform at hop lane offsets
        raise ValueError("radix8dif_fused requires hop_length % 128 == 0")
    if (n_fft // 8) % 128:
        # eighth blocks are lane slices at n_fft/8 offsets
        raise ValueError("radix8dif_fused requires n_fft % 1024 == 0")
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    pieces = n_fft // hop_length
    t_pad = _round_up(t, 8)
    need = (t_pad + pieces - 1) * hop_length
    # torch.stft center=True semantics. The ONLY host-side prep is this
    # reflect pad — no de-interleave, no transpose (see radix4dif).
    x = stft_ops.reflect_pad(waveform, n_fft // 2)
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    x = x[:, :need].reshape(b, 1, need)

    comp = 3 if dft_passes >= 6 else 2
    dft, wtw, fbs = _constants_radix8dif(
        sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max,
        components=comp,
    )
    e = n_fft // 8
    nb0_pad = dft[0].shape[2]
    m_pad = fbs[0].shape[2]
    group = next(g for g in (4, 2, 1) if b % g == 0)

    def const(cols):
        return pl.BlockSpec((comp, e, cols), lambda bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def fbspec(rows):
        # hi/lo-split mel matrix for the 3-pass bf16 projection (_dot_mel)
        return pl.BlockSpec((2, rows, m_pad), lambda bi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((group, 1, need), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        const(nb0_pad), const(nb0_pad),    # C0, S0
        const(e // 2), const(e // 2),      # C4, S4
        const(e), const(e),                # C1, S1
        const(e), const(e),                # C2, S2
        const(e), const(e),                # C3, S3
        pl.BlockSpec((8, 1, e), lambda bi: (0, 0, 0), memory_space=pltpu.VMEM),
        fbspec(nb0_pad), fbspec(e // 2), fbspec(e), fbspec(e), fbspec(e),
    ]
    extra = ()
    if spec_mask_bounds is not None:
        # (b//group, 1, group*4): see _log_mel_radix4dif_fused on the SMEM
        # block-shape rule
        in_specs.append(pl.BlockSpec((1, 1, group * 4),
                                     lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.SMEM))
        extra = (spec_mask_bounds.astype(jnp.float32)
                 .reshape(b // group, 1, group * 4),)
    out = pl.pallas_call(
        functools.partial(
            _kernel_radix8dif_fused, t=t, t_pad=t_pad, pieces=pieces,
            hop=hop_length, n_mels=n_mels, normalize=normalize, top_db=top_db,
            eps=eps, passes=dft_passes, group=group,
            with_masks=spec_mask_bounds is not None,
        ),
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, t_pad, m_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *(jnp.asarray(y) for y in dft), jnp.asarray(wtw),
      *(jnp.asarray(y) for y in fbs), *extra)
    return jnp.swapaxes(out[:, :t, :n_mels], 1, 2)  # (B, n_mels, T)


def _log_mel_radix2(waveform, sample_rate, n_fft, hop_length, n_mels,
                    mel_scale, norm, tile_r: int, interpret: bool,
                    f_min: float = 0.0, f_max: float | None = None,
                    dft_passes: int = 3):
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    frames = stft_ops.frame_signal(waveform, n_fft, hop_length)  # (B, T, n_fft)
    rows = b * t
    rows_pad = _round_up(rows, tile_r)
    flat = frames.reshape(rows, n_fft)
    if rows_pad != rows:
        flat = jnp.pad(flat, ((0, rows_pad - rows), (0, 0)))
    # de-interleave outside the kernel (strided lane slicing is hostile to
    # Mosaic): (rows, 1024, 2) -> even/odd halves
    pairs = flat.reshape(rows_pad, n_fft // 2, 2)
    e = pairs[:, :, 0]
    o = pairs[:, :, 1]

    ce, se, co, so, cj, sj, fb_lo, fb_hi = _constants_radix2(
        sample_rate, n_fft, n_mels, mel_scale, norm, f_min, f_max
    )
    h = n_fft // 2
    nb_pad = ce.shape[2]
    m_pad = fb_lo.shape[1]

    const3 = lambda: pl.BlockSpec((2, h, nb_pad), lambda ri: (0, 0, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    const2 = lambda shp: pl.BlockSpec(shp, lambda ri: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_radix2, passes=dft_passes),
        grid=(rows_pad // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, h), lambda ri: (ri, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, h), lambda ri: (ri, 0), memory_space=pltpu.VMEM),
            const3(), const3(), const3(), const3(),
            const2((1, nb_pad)), const2((1, nb_pad)),
            const2((nb_pad, m_pad)), const2((nb_pad, m_pad)),
        ],
        out_specs=pl.BlockSpec((tile_r, m_pad), lambda ri: (ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, m_pad), jnp.float32),
        # constants + per-tile intermediates land just past the default
        # 16 MB scoped-vmem budget at some row counts (measured +258 KB on
        # an 8 x 5 s batch)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(e, o, *(jnp.asarray(x) for x in (ce, se, co, so, cj, sj, fb_lo, fb_hi)))
    mel = out[:rows, :n_mels].reshape(b, t, n_mels)
    return jnp.swapaxes(mel, 1, 2)  # (B, n_mels, T)


def analytic_flops(algorithm: str, length: int, n_fft: int, hop_length: int,
                   n_mels: int, dft_passes: int | None = None) -> int:
    """Per-example FLOPs executed by a kernel algorithm, by the SAME
    convention XLA cost analysis applies to the XLA mel paths: 2*M*N*K per
    dot_general, each explicit bf16 decomposition pass counted as its own
    dot (the XLA radix-2 path's bf16x4 split appears to cost analysis as 4
    dots; the kernels' 3-pass split is costed identically here), padded
    shapes as executed on the MXU, elementwise ops at 1 FLOP each.

    Fills the utilization column bench.py --sweep could not report for
    Pallas backends — XLA's cost analysis sees a Mosaic kernel as an opaque
    custom call with zero FLOPs (VERDICT r2 #7)."""
    if dft_passes is None:
        dft_passes = 5 if algorithm in ("radix8dif_fused", "radix16dif_fused") else 3
    t = stft_ops.num_frames(length, n_fft, hop_length)
    t_pad = _round_up(t, 8)
    m_pad = _round_up(n_mels, 128)
    if algorithm == "radix16dif_fused":
        s = n_fft // 16
        nb0_pad = _round_up(s // 2 + 1, 128)
        # 30 DFT dots: u0 @ (C0, S0), u8 @ (C8, S8) at s/2 cols, and
        # u1..u7 re+im at 4 full-s dots each
        cols = 2 * nb0_pad + 2 * (s // 2) + 7 * 4 * s
        dft = dft_passes * 2 * t_pad * s * cols
        # window (16) + two-stage butterflies (~70) + hi/lo splits (~32)
        prep = 118 * t_pad * s
        # powers on the nine spectra's output columns
        prep += 3 * t_pad * (nb0_pad + s // 2 + 7 * s)
        # 3-pass bf16 mel projection (_dot_mel): 3 explicit dots
        mel = 3 * 2 * t_pad * (nb0_pad + s // 2 + 7 * s) * m_pad
        epilogue = 6 * t_pad * m_pad
        return dft + prep + mel + epilogue
    if algorithm == "radix4_fused":
        q = n_fft // 4
        nb_pad = _round_up(q // 2 + 1, 128)
        dft = dft_passes * 8 * 2 * t_pad * q * nb_pad
        # per region: j=1..3 twiddle FMAs on re+im (8 ops each) + power (3)
        recomb = 4 * (3 * 8 + 3) * t_pad * nb_pad
        mel = 4 * 2 * t_pad * nb_pad * m_pad
        epilogue = 6 * t_pad * m_pad
        return dft + recomb + mel + epilogue
    if algorithm == "radix8dif_fused":
        e = n_fft // 8
        nb0_pad = _round_up(e // 2 + 1, 128)
        # summed output columns over the 16 DFT dots: u0 @ (C0, S0),
        # u4 @ (C4, S4) at e/2 cols, and u1/u2/u3 re+im at 4 full-e dots each
        cols = 2 * nb0_pad + 2 * (e // 2) + 3 * 4 * e
        dft = dft_passes * 2 * t_pad * e * cols
        # window (8) + butterflies (~26) + hi/lo splits (~16) per e-column
        prep = 50 * t_pad * e
        # powers on the five spectra's output columns
        prep += 3 * t_pad * (nb0_pad + e // 2 + 3 * e)
        # 3-pass bf16 mel projection (_dot_mel): 3 explicit dots
        mel = 3 * 2 * t_pad * (nb0_pad + e // 2 + 3 * e) * m_pad
        epilogue = 6 * t_pad * m_pad
        return dft + prep + mel + epilogue
    if algorithm == "radix4dif_fused":
        q = n_fft // 4
        nb0_pad = _round_up(q // 2 + 1, 128)
        # summed output columns over the 8 dots: u0 @ (C0, S0), the two v1
        # sequences @ (C1, S1), u2 @ (C2, S2)
        cols = 2 * nb0_pad + 4 * q + 2 * (q // 2)
        dft = dft_passes * 2 * t_pad * q * cols
        # window (4) + u/v combinations (~10) + powers (9)
        prep = 23 * t_pad * q
        mel = 2 * t_pad * (nb0_pad + q + q // 2) * m_pad
        epilogue = 6 * t_pad * m_pad
        return dft + prep + mel + epilogue
    if algorithm in ("radix2_fused", "radix2"):
        h = n_fft // 2
        nb_pad = _round_up(h // 2 + 1, 128)
        dft = dft_passes * 4 * 2 * t_pad * h * nb_pad
        # cr/st/ct/sr products + 4 re/im combinations + 2 powers
        recomb = (4 + 8 + 6) * t_pad * nb_pad
        mel = 2 * 2 * t_pad * nb_pad * m_pad
        epilogue = (6 * t_pad * m_pad) if algorithm == "radix2_fused" else 0
        return dft + recomb + mel + epilogue
    if algorithm in ("bf16x3", "f32"):
        f_pad = _round_up(n_fft // 2 + 1, 128)
        passes = 3 if algorithm == "bf16x3" else 1
        dft = passes * 2 * 2 * t_pad * n_fft * f_pad  # cos + sin matmuls
        power = 3 * t_pad * f_pad
        mel = 2 * t_pad * f_pad * m_pad
        return dft + power + mel
    raise ValueError(f"unknown algorithm {algorithm!r}")


def log_mel_pallas(
    waveform: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    *,
    f_min: float = 0.0,
    f_max: float | None = None,
    top_db: float | None = None,
    mel_scale: str = "htk",
    norm: str | None = None,
    algorithm: str = "radix2",  # "radix16dif_fused" | "radix8dif_fused" | "radix4dif_fused" | "radix4_fused" | "radix2_fused" | "radix2" | "bf16x3" | "f32"
    normalize: bool = False,
    tile_t: int = 64,
    f_tile: int = 512,
    interpret: bool = False,
    # bf16 passes per DFT matmul (see _dot_parts). None = per-algorithm
    # default: 5 for radix8dif_fused / radix16dif_fused — the asymmetric
    # 3-way-operand x 2-way-matrix split, which meets the 1e-3 dB budget
    # UNRESTRICTED (8.6e-4 on-chip, no active-region qualifier) at 58.1k
    # e2e clips/s with the bf16x3 mel projection (-2.3%% vs the 4-pass
    # default it replaced; VERDICT r4 #1) — and 3 for everything else.
    # 4 = the former 2-way/2-way production default (1.24e-3 unrestricted,
    # 4.8e-4 in the 25 dB active region, 61.3k clips/s). 6 (radix8/16 DIF
    # only) = full 3-way split: f32-equivalent DFT, 4.8e-4 dB unrestricted
    # at -4.5% vs the 5-pass default (PARITY.md, VERDICT r3 #4).
    dft_passes: int | None = None,
    spec_mask_bounds: jax.Array | None = None,  # (B, 4) per-example SpecAugment
) -> jax.Array:
    """(B, L) waveform -> (B, n_mels, T) log-mel, one fused TPU kernel.

    Semantics identical to ops.mel.log_mel_spectrogram(..., to_db="amplitude",
    use_matmul_dft=True) (torchaudio MelSpectrogram + AmplitudeToDB chain,
    reference preprocessing.py:38-47). For the tiled algorithms top_db clips
    per example against its global dB peak, so it applies after the kernel (a
    block never sees the whole example); every *_fused algorithm (radix2/
    radix4/radix4dif/radix8dif) processes whole examples per grid cell and
    applies top_db — and, with normalize=True, the per-example zero-mean/
    unit-var normalize (ops.mel.normalize_spectrogram, reference
    preprocessing.py:111-116), plus optional SpecAugment masking via
    spec_mask_bounds — inside the kernel epilogue.
    """
    if waveform.ndim == 1:
        return log_mel_pallas(
            waveform[None], sample_rate, n_fft, hop_length, n_mels,
            f_min=f_min, f_max=f_max, top_db=top_db,
            mel_scale=mel_scale, norm=norm, algorithm=algorithm,
            normalize=normalize, tile_t=tile_t, f_tile=f_tile,
            interpret=interpret, dft_passes=dft_passes,
            spec_mask_bounds=None if spec_mask_bounds is None
            else spec_mask_bounds[None],
        )[0]
    if spec_mask_bounds is not None and algorithm not in (
        "radix2_fused", "radix4_fused", "radix4dif_fused", "radix8dif_fused",
        "radix16dif_fused",
    ):
        raise ValueError("spec_mask_bounds requires a fused algorithm")
    if dft_passes is None:
        dft_passes = 5 if algorithm in ("radix8dif_fused", "radix16dif_fused") else 3
    elif dft_passes not in (3, 4, 5, 6):
        # _dot_parts implements exactly these budgets; 7 would silently run
        # the 6-pass product (claiming accuracy it doesn't add)
        raise ValueError(
            f"dft_passes must be 3 or 4 (2-way bf16 split), 5 (3-way "
            f"operand x 2-way matrix), or 6 (3-way hi/mid/lo split), "
            f"got {dft_passes}")
    elif dft_passes >= 5 and algorithm not in ("radix8dif_fused",
                                               "radix16dif_fused"):
        # the 3-way operand split rides _split_parts/_dot_parts, which only
        # the DIF production kernels call; elsewhere 5/6 would silently
        # degrade to a 3-pass 2-way run
        raise ValueError(
            f"dft_passes={dft_passes} (3-way split) requires radix8dif_fused"
            f" or radix16dif_fused, got {algorithm}")

    def clip_top_db(db):
        if top_db is None:
            return db
        peak = jnp.max(db, axis=(-2, -1), keepdims=True)
        return jnp.maximum(db, peak - top_db)

    def normalize_out(db):
        if not normalize:
            return db
        from audio_classification_icbhi_tpu.ops.mel import normalize_spectrogram

        return normalize_spectrogram(db)

    if algorithm == "radix16dif_fused":
        return _log_mel_radix16dif_fused(
            waveform, sample_rate, n_fft, hop_length, n_mels,
            mel_scale, norm, interpret=interpret,
            f_min=f_min, f_max=f_max, top_db=top_db, normalize=normalize,
            dft_passes=dft_passes, spec_mask_bounds=spec_mask_bounds,
        )
    if algorithm == "radix8dif_fused":
        return _log_mel_radix8dif_fused(
            waveform, sample_rate, n_fft, hop_length, n_mels,
            mel_scale, norm, interpret=interpret,
            f_min=f_min, f_max=f_max, top_db=top_db, normalize=normalize,
            dft_passes=dft_passes, spec_mask_bounds=spec_mask_bounds,
        )
    if algorithm == "radix4dif_fused":
        return _log_mel_radix4dif_fused(
            waveform, sample_rate, n_fft, hop_length, n_mels,
            mel_scale, norm, interpret=interpret,
            f_min=f_min, f_max=f_max, top_db=top_db, normalize=normalize,
            dft_passes=dft_passes, spec_mask_bounds=spec_mask_bounds,
        )
    if algorithm == "radix4_fused":
        return _log_mel_radix4_fused(
            waveform, sample_rate, n_fft, hop_length, n_mels,
            mel_scale, norm, interpret=interpret,
            f_min=f_min, f_max=f_max, top_db=top_db, normalize=normalize,
            dft_passes=dft_passes, spec_mask_bounds=spec_mask_bounds,
        )
    if algorithm == "radix2_fused":
        if n_fft % 4:
            raise ValueError("radix2_fused requires n_fft divisible by 4")
        return _log_mel_radix2_fused(
            waveform, sample_rate, n_fft, hop_length, n_mels,
            mel_scale, norm, interpret=interpret,
            f_min=f_min, f_max=f_max, top_db=top_db, normalize=normalize,
            dft_passes=dft_passes, spec_mask_bounds=spec_mask_bounds,
        )
    if algorithm == "radix2":
        if n_fft % 4:
            raise ValueError("radix2 requires n_fft divisible by 4")
        return normalize_out(clip_top_db(_log_mel_radix2(
            waveform, sample_rate, n_fft, hop_length, n_mels,
            mel_scale, norm, tile_r=128, interpret=interpret,
            f_min=f_min, f_max=f_max, dft_passes=dft_passes,
        )))
    b, length = waveform.shape
    t = stft_ops.num_frames(length, n_fft, hop_length)
    frames = stft_ops.frame_signal(waveform, n_fft, hop_length)  # (B, T, n_fft)
    t_pad = _round_up(t, tile_t)
    if t_pad != t:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - t), (0, 0)))

    if algorithm == "bf16x3":
        wc, ws, fb = _constants_bf16x3(sample_rate, n_fft, n_mels, mel_scale, norm,
                                       f_min, f_max)
        kernel = _kernel_bf16x3
        f_pad = wc.shape[2]
        dft_spec = lambda ft: pl.BlockSpec(  # noqa: E731
            (2, n_fft, ft), lambda bi, ti, fi: (0, 0, fi), memory_space=pltpu.VMEM
        )
    elif algorithm == "f32":
        wc, ws, fb = _constants(sample_rate, n_fft, n_mels, mel_scale, norm,
                                f_min, f_max)
        kernel = _kernel_f32
        f_pad = wc.shape[1]
        dft_spec = lambda ft: pl.BlockSpec(  # noqa: E731
            (n_fft, ft), lambda bi, ti, fi: (0, fi), memory_space=pltpu.VMEM
        )
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    m_pad = fb.shape[1]
    # largest lane-aligned divisor of f_pad not exceeding the requested tile
    f_tile = min(f_tile, f_pad)
    while f_pad % f_tile or f_tile % 128:
        f_tile -= 128
    f_tiles = f_pad // f_tile

    grid = (b, t_pad // tile_t, f_tiles)
    out = pl.pallas_call(
        functools.partial(kernel, f_tiles=f_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_t, n_fft), lambda bi, ti, fi: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            dft_spec(f_tile),
            dft_spec(f_tile),
            pl.BlockSpec((f_tile, m_pad), lambda bi, ti, fi: (fi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, m_pad), lambda bi, ti, fi: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_t, m_pad), jnp.float32)],
        interpret=interpret,
    )(frames, jnp.asarray(wc), jnp.asarray(ws), jnp.asarray(fb))
    # crop padding, transpose to torchaudio layout (B, n_mels, T)
    return normalize_out(clip_top_db(jnp.swapaxes(out[:, :t, :n_mels], 1, 2)))
