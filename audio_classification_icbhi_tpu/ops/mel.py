"""Mel filterbanks and log-mel front end (TPU-native).

Replaces the reference's CPU torchaudio chain
(reference: src/data/preprocessing.py:38-47 — T.MelSpectrogram(power=2.0)
-> T.AmplitudeToDB) and the librosa chain its spectrogram analyzer uses
(reference: realtime_analyzer_spec.py:295-305 — librosa.feature.melspectrogram
-> librosa.power_to_db(ref=np.max)). Both conventions are supported
explicitly:

- mel_scale: "htk" (torchaudio default) or "slaney" (librosa default)
- norm: None (torchaudio default) or "slaney" (librosa default)
- amplitude_to_db: torchaudio semantics (10*log10(max(x, amin)), ref=1.0)
- power_to_db: librosa semantics (ref=max, top_db clipping)

The whole front end is a single fused XLA graph: framing gather -> window
multiply -> DFT -> power -> mel matmul -> log -> normalize. On TPU the mel
projection is a (T, n_bins) @ (n_bins, n_mels) matmul on the MXU; the
Pallas kernel in ops/pallas_mel.py fuses the same chain by hand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_icbhi_tpu.ops import stft as stft_ops


# --- Mel scales ------------------------------------------------------------

_F_SP = 200.0 / 3.0  # Slaney: 66.67 Hz per mel below 1 kHz
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq, mel_scale: str = "htk"):
    """Hz -> mel. HTK: 2595*log10(1+f/700). Slaney: linear<1kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    if mel_scale != "slaney":
        raise ValueError(f"unknown mel_scale: {mel_scale!r}")
    mel = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel, mel_scale: str = "htk"):
    """Mel -> Hz (inverse of hz_to_mel)."""
    mel = np.asarray(mel, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    if mel_scale != "slaney":
        raise ValueError(f"unknown mel_scale: {mel_scale!r}")
    freq = _F_SP * mel
    log_region = mel >= _MIN_LOG_MEL
    freq = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), freq)
    return freq


@functools.lru_cache(maxsize=16)
def _mel_filterbank_np(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    mel_scale: str,
    norm: str | None,
) -> np.ndarray:
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = hz_to_mel(f_min, mel_scale)
    m_max = hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)
    # Triangular filters between consecutive mel-spaced frequency points.
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]            # rising edge
    up = slopes[:, 2:] / f_diff[None, 1:]                 # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))            # (n_freqs, n_mels)
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown norm: {norm!r}")
    return fb.astype(np.float32)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    mel_scale: str = "htk",
    norm: str | None = None,
) -> jax.Array:
    """Triangular mel filterbank, shape (n_fft//2+1, n_mels).

    Defaults reproduce torchaudio MelSpectrogram (htk scale, no norm);
    (mel_scale="slaney", norm="slaney") reproduces librosa defaults.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    return jnp.asarray(
        _mel_filterbank_np(sample_rate, n_fft, n_mels, float(f_min), float(f_max), mel_scale, norm)
    )


# --- dB conversion ----------------------------------------------------------

def amplitude_to_db(
    x: jax.Array,
    *,
    stype: str = "power",
    ref: float = 1.0,
    amin: float = 1e-10,
    top_db: float | None = None,
) -> jax.Array:
    """torchaudio T.AmplitudeToDB semantics (reference preprocessing.py:47).

    power: 10*log10(max(x, amin)) - 10*log10(max(amin, ref)).
    top_db, if given, clips per-example to (max - top_db) over the last
    two (freq, time) axes.
    """
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.maximum(x, amin))
    db = db - multiplier * float(np.log10(max(amin, ref)))
    if top_db is not None:
        peak = jnp.max(db, axis=(-2, -1), keepdims=True)
        db = jnp.maximum(db, peak - top_db)
    return db


def power_to_db(
    x: jax.Array,
    *,
    ref: str | float = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
) -> jax.Array:
    """librosa.power_to_db semantics (reference realtime_analyzer_spec.py:305).

    ref="max" uses the per-array max as the reference (librosa ref=np.max).
    """
    x = jnp.asarray(x)
    log_spec = 10.0 * jnp.log10(jnp.maximum(x, amin))
    if isinstance(ref, str):
        if ref != "max":
            raise ValueError("ref must be a float or 'max'")
        ref_val = jnp.max(x)
    else:
        ref_val = jnp.asarray(ref)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(ref_val, amin))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


# --- Radix-2 XLA front end ----------------------------------------------------

@functools.lru_cache(maxsize=16)
def _radix2_xla_constants(
    sample_rate: int, n_fft: int, n_mels: int, mel_scale: str, norm,
    f_min: float = 0.0, f_max: float | None = None,
):
    """Radix-2 DIT constants for the XLA path: windowed even/odd
    (n_fft/2)-point DFT matrices, twiddle vectors, and the mel filterbank
    split into a lower-half part and an UPPER-HALF part pre-permuted to
    j-order (fb_hi[j] = fb[n_fft/2 - j], Nyquist at j=0), which folds the
    conjugate symmetry so no bin reversal is needed. Same derivation as the
    Pallas radix-2 kernel (ops/pallas_mel.py), validated exact vs rfft."""
    h = n_fft // 2
    nb = h // 2 + 1
    m = np.arange(h)
    k = np.arange(nb)
    ang = 2.0 * np.pi * np.outer(m, k) / h
    n = np.arange(n_fft)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    ce = (w[0::2][:, None] * np.cos(ang)).astype(np.float32)
    se = (w[0::2][:, None] * np.sin(ang)).astype(np.float32)
    co = (w[1::2][:, None] * np.cos(ang)).astype(np.float32)
    so = (w[1::2][:, None] * np.sin(ang)).astype(np.float32)
    cj = np.cos(np.pi * np.arange(nb) / h).astype(np.float32)
    sj = np.sin(np.pi * np.arange(nb) / h).astype(np.float32)
    if f_max is None:
        f_max = sample_rate / 2.0
    fb = _mel_filterbank_np(
        sample_rate, n_fft, n_mels, float(f_min), float(f_max), mel_scale, norm
    ).astype(np.float64)
    fb_lo = fb[:nb].astype(np.float32)
    fb_hi = np.zeros_like(fb_lo)
    for j in range(0, nb - 1):
        fb_hi[j] = fb[h - j]  # bins n_fft/2 (Nyquist) .. nb+1; fb_hi[nb-1] stays 0
    return ce, se, co, so, cj, sj, fb_lo, fb_hi


def _split_bf16_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    import ml_dtypes

    hi = x.astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _log_mel_radix2_xla(
    waveform, sample_rate, n_fft, hop_length, n_mels, mel_scale, norm,
    precision="bf16x4", f_min=0.0, f_max=None,
):
    """waveform (..., L) -> un-dB mel (..., n_mels, T) via the radix-2
    decomposition in plain XLA: half the DFT FLOPs of the direct matmul-DFT
    and still fully fusable with downstream consumers.

    precision: "bf16x4" (default) hand-decomposes each f32 DFT matmul into 4
    bf16 MXU passes (hi/lo splits of both operands) — near-f32 accuracy
    (~5e-4 dB worst case) at 2/3 the passes of XLA HIGHEST; or a
    jax.lax.Precision for the stock XLA behavior.
    """
    ce, se, co, so, cj, sj, fb_lo, fb_hi = _radix2_xla_constants(
        sample_rate, n_fft, n_mels, mel_scale, norm, float(f_min),
        None if f_max is None else float(f_max),
    )
    cj, sj, fb_lo, fb_hi = (jnp.asarray(x) for x in (cj, sj, fb_lo, fb_hi))
    if precision == "bf16x4":
        def split(x):
            # bf16 hi/lo split via explicit bit arithmetic: XLA-TPU's
            # simplifier elides `x - upcast(downcast(x))` to ZERO (measured),
            # silently degrading the decomposition to plain bf16. Integer
            # round-to-nearest-even to the top 16 bits cannot be elided;
            # hi is exactly representable in bf16 and the residual
            # (<= 2^-9 relative) fits the second bf16.
            u = jax.lax.bitcast_convert_type(x, jnp.uint32)
            bias = np.uint32(0x7FFF) + ((u >> 16) & np.uint32(1))
            hi = jax.lax.bitcast_convert_type(
                (u + bias) & np.uint32(0xFFFF0000), jnp.float32
            )
            return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)

        # Rewrite-proof bf16x4: XLA's algebraic simplifier turns sums of
        # dots sharing an operand (dot(a,b)+dot(a,c) or dot(a,M)+dot(b,M))
        # into a single dot with the ADD DONE IN BF16, silently destroying
        # the lo components (measured 0.43 dB error). Folding the whole
        # decomposition into ONE dot sidesteps it: the input carries
        # [x_hi | x_lo] on the contraction axis, the matrix carries
        # [[m_hi | m_lo], [m_hi | m_lo]], and the two output halves
        # (x_hi@m_hi + x_lo@m_hi | x_hi@m_lo + x_lo@m_lo) add in f32.
        #
        # The split happens on the raw WAVEFORM (it commutes exactly with
        # the framing gather/concat), so the framed tensors only ever exist
        # in bf16 — half the HBM traffic of framing in f32 then splitting.
        w_hi, w_lo = split(waveform)
        e_hi, o_hi = stft_ops.frame_even_odd(w_hi, n_fft, hop_length)
        e_lo, o_lo = stft_ops.frame_even_odd(w_lo, n_fft, hop_length)
        e2 = jnp.concatenate([e_hi, e_lo], axis=-1)  # (..., n_fft) bf16
        o2 = jnp.concatenate([o_hi, o_lo], axis=-1)
        mats = {}
        for name, m in (("ce", ce), ("se", se), ("co", co), ("so", so)):
            hi, lo = _split_bf16_np(m)
            hl = np.concatenate([hi, lo], axis=1)
            mats[name] = jnp.asarray(np.concatenate([hl, hl], axis=0))
        nb = ce.shape[1]

        def dot4(x2, name):
            both = jnp.matmul(x2, mats[name], preferred_element_type=jnp.float32)
            return both[..., :nb] + both[..., nb:]

        p = dot4(e2, "ce")
        q = dot4(e2, "se")
        r = dot4(o2, "co")
        t = dot4(o2, "so")
        dot = functools.partial(
            jnp.matmul, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    else:
        e, o = stft_ops.frame_even_odd(waveform, n_fft, hop_length)
        dot = functools.partial(
            jnp.matmul, precision=precision, preferred_element_type=jnp.float32
        )
        ce, se, co, so = (jnp.asarray(x) for x in (ce, se, co, so))
        p = dot(e, ce)
        q = dot(e, se)
        r = dot(o, co)
        t = dot(o, so)
    cr, st, ct, sr = cj * r, sj * t, cj * t, sj * r
    re_lo = p + cr - st
    im_lo = q + ct + sr
    re_hi = p - cr + st
    im_hi = q - ct - sr
    mel = dot(re_lo * re_lo + im_lo * im_lo, fb_lo) + dot(
        re_hi * re_hi + im_hi * im_hi, fb_hi
    )
    return jnp.swapaxes(mel, -1, -2)  # (..., n_mels, T)


# --- Fused log-mel front end -------------------------------------------------

def log_mel_spectrogram(
    waveform: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    *,
    f_min: float = 0.0,
    f_max: float | None = None,
    mel_scale: str = "htk",
    norm: str | None = None,
    power: float = 2.0,
    center: bool = True,
    use_matmul_dft: bool = False,
    to_db: str = "amplitude",  # "amplitude" (torchaudio) | "power_max" (librosa) | "none"
    top_db: float | None = None,
) -> jax.Array:
    """waveform (..., L) -> log-mel (..., n_mels, T). Fully jittable."""
    spec = stft_ops.spectrogram(
        waveform, n_fft, hop_length, power=power, center=center, use_matmul_dft=use_matmul_dft
    )  # (..., n_bins, T)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max, mel_scale, norm)
    # (..., n_bins, T) x (n_bins, n_mels) -> (..., n_mels, T). HIGHEST keeps
    # f32 MXU accuracy (TPU default bf16 precision breaks 1e-3 mel parity).
    mel = jnp.einsum(
        "...ft,fm->...mt", spec, fb,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    if to_db == "amplitude":
        return amplitude_to_db(mel, stype="power" if power == 2.0 else "magnitude", top_db=top_db)
    if to_db == "power_max":
        return power_to_db(mel, ref="max", top_db=80.0 if top_db is None else top_db)
    if to_db == "none":
        return mel
    raise ValueError(f"unknown to_db mode: {to_db!r}")


def normalize_spectrogram(mel_spec: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-example zero-mean unit-variance normalization
    (reference preprocessing.py:111-116 normalizes over the whole tensor;
    here per leading example so it vmaps/batches identically)."""
    axes = tuple(range(mel_spec.ndim - 2, mel_spec.ndim))
    mean = jnp.mean(mel_spec, axis=axes, keepdims=True)
    # Match torch.std default: unbiased (ddof=1).
    n = np.prod([mel_spec.shape[a] for a in axes])
    var = jnp.var(mel_spec, axis=axes, keepdims=True) * (n / max(n - 1, 1))
    return (mel_spec - mean) / (jnp.sqrt(var) + eps)


class MelFrontend:
    """Configured wav->normalized-log-mel transform (the on-device analog of
    reference AudioPreprocessor, src/data/preprocessing.py:9-151, minus file
    I/O which stays on the host).

    Call with a (..., L) float32 waveform; returns (..., n_mels, T).
    The instance is hashable/static so jitted functions can close over it.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        n_mels: int = 128,
        n_fft: int = 2048,
        hop_length: int = 512,
        duration: float = 5.0,
        *,
        f_min: float = 0.0,
        f_max: float | None = None,
        top_db: float | None = None,
        mel_scale: str = "htk",
        norm: str | None = None,
        use_matmul_dft: bool = True,
        normalize: bool = True,
        backend: str = "auto",  # "auto" | "pallas" | "xla"
        # force a specific kernel instead of the measured auto policy
        # (e.g. "radix8dif_fused", whose ~1.2e-3 dB error floor sits just
        # outside the 1e-3 production budget — see test_pallas_mel).
        # Eligibility is NOT re-checked beyond the kernel's own asserts.
        pallas_algorithm: str | None = None,
        # None = per-algorithm default (5 for the radix-8/16 DIF kernels,
        # 3 elsewhere). 5 = asymmetric 3-way-operand x 2-way-matrix split
        # (meets the 1e-3 dB budget UNRESTRICTED with the same constants
        # as 4). 6 = full 3-way hi/mid/lo split with f32-equivalent DFT
        # accuracy (~4.6e-4 dB unrestricted) at +50% DFT MXU work —
        # measured trades in PARITY.md (VERDICT r3 #4, r4 #1).
        dft_passes: int | None = None,
    ):
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.duration = duration
        self.target_length = int(sample_rate * duration)
        # torchaudio MelSpectrogram surface (reference preprocessing.py:38-44
        # uses the defaults f_min=0, f_max=sr/2, no top_db clipping)
        self.f_min = float(f_min)
        self.f_max = None if f_max is None else float(f_max)
        self.top_db = None if top_db is None else float(top_db)
        self.mel_scale = mel_scale
        self.norm = norm
        self.use_matmul_dft = use_matmul_dft
        self.normalize = normalize
        self.backend = backend
        self.pallas_algorithm = pallas_algorithm
        self.dft_passes = dft_passes
        # Validate the accuracy opt-in HERE, not at trace time deep inside
        # the kernel dispatcher: a mis-shaped dft_passes=6 request must fail
        # with the frontend's own contract, and the XLA backends (which run
        # their own fixed bf16x3/radix-2 decompositions) must not silently
        # drop it. On backend="auto" the knob applies whenever the Pallas
        # path engages (real TPU); on CPU auto falls back to XLA and the
        # knob is inert — the Pallas accuracy modes are TPU-kernel options.
        if dft_passes is not None:
            if dft_passes not in (3, 4, 5, 6):
                raise ValueError(
                    f"dft_passes must be 3 or 4 (2-way bf16 split), 5 "
                    f"(3-way operand x 2-way matrix), or 6 "
                    f"(3-way hi/mid/lo split), got {dft_passes}")
            if backend in ("xla", "xla_radix2"):
                raise ValueError(
                    f"dft_passes selects a Pallas kernel decomposition; "
                    f"backend={backend!r} never runs the Pallas kernels")
            if dft_passes >= 5:
                alg = self._pallas_algorithm()
                if alg not in ("radix8dif_fused", "radix16dif_fused"):
                    raise ValueError(
                        f"dft_passes={dft_passes} (3-way split) requires the "
                        f"radix-8/16 DIF kernels; this shape selects {alg!r} "
                        f"(need n_fft % 1024 == 0 and hop_length % 128 == 0)")

    @classmethod
    def from_config(cls, config: dict, **overrides) -> "MelFrontend":
        """Build from a config dict's data section (full config or the
        section itself). Optional keys f_min/f_max/top_db extend the
        reference schema with torchaudio MelSpectrogram's full surface."""
        dcfg = config.get("data", config)
        kwargs = dict(
            sample_rate=dcfg["sample_rate"],
            n_mels=dcfg["n_mels"],
            n_fft=dcfg["n_fft"],
            hop_length=dcfg["hop_length"],
            duration=dcfg["duration"],
            f_min=dcfg.get("f_min", 0.0),
            f_max=dcfg.get("f_max"),
            top_db=dcfg.get("top_db"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def _use_pallas(self) -> bool:
        """Explicit backend choice; `auto` batch-dependent selection lives in
        _auto_pallas (it needs the input shape)."""
        if self.backend == "pallas":
            return True
        return False

    def _auto_pallas(self, waveform: jax.Array, *, need_normalize: bool = True) -> bool:
        """Measured auto policy (v5e end-to-end sweep, PARITY.md): the
        fused kernels — framing in VMEM, quarter/half-size DFT matmuls,
        3-pass bf16 decomposition, normalize epilogue fused when nothing
        sits between mel and normalize — beat the XLA radix-2 path through
        the full mel+CNN pipeline at every batch size (45.4k vs 29.9k
        clips/s at batch 128, +23% at batch 8). auto therefore selects
        Pallas whenever a fused kernel is eligible and the backend is a
        real TPU (Mosaic kernels don't run on CPU). need_normalize=False
        is the bare log_mel call (spec-aug rides between mel and normalize
        on the augmented training path): the kernel still wins on DFT time
        alone, the epilogue just runs outside."""
        if self.backend != "auto":
            return False
        if need_normalize and not self.normalize:
            return False
        if waveform.ndim != 2:
            return False
        if self._pallas_algorithm() not in (
            "radix2_fused", "radix4_fused", "radix4dif_fused",
            "radix8dif_fused", "radix16dif_fused"
        ):
            return False
        try:
            # honor an active jax.default_device(...) override — the Mosaic
            # kernel must not be emitted for a CPU-placed computation on a
            # TPU host
            dev = jax.config.jax_default_device or jax.devices()[0]
            return getattr(dev, "platform", None) == "tpu"
        except RuntimeError:
            return False

    def _pallas_algorithm(self) -> str:
        """Best eligible kernel: the fused kernels frame IN VMEM (need
        n_fft % hop == 0 like frame_signal, plus lane-aligned slicing) and
        fuse the per-example epilogue. Decimation-in-FREQUENCY kernels are
        preferred — their wrapper's only prep is the reflect pad, where the
        DIT kernels' stream de-interleave cost a serialized HBM pass that
        was the entire batch-512 knee. radix16dif_fused (terminal
        decimation: sixteenth blocks = one 128-lane register, 48% less DFT
        MXU work than radix-8; 58.5k vs 49.1k end-to-end clips/s at batch
        128 on v5e and the winner at EVERY batch size in the r3 sweep,
        89% retention at batch 1024) needs n_fft % 2048 == 0 (lane-aligned
        sixteenth blocks) and hop % 128 == 0; its 5-pass asymmetric
        default (r5) measures 8.6e-4 dB UNRESTRICTED on-chip — inside the
        1e-3 budget with no active-region qualifier (PARITY_r05.json).
        radix8dif_fused (42% less DFT MXU work than radix-4 DIF at equal
        passes) covers n_fft % 1024 == 0 with the same 5-pass default and
        parity basis. radix4dif_fused covers
        n_fft % 512 == 0; radix4_fused/radix2_fused remain for comparison;
        radix2 needs only n_fft % 4 == 0; bf16x3 is the general fallback."""
        if self.pallas_algorithm is not None:
            return self.pallas_algorithm
        if self.n_fft % 4 == 0:
            if self.n_fft % self.hop_length == 0:
                if (self.n_fft % 2048 == 0 and self.hop_length % 128 == 0):
                    return "radix16dif_fused"
                if (self.n_fft % 1024 == 0 and self.hop_length % 128 == 0):
                    return "radix8dif_fused"
                if (self.n_fft % 512 == 0 and self.hop_length % 128 == 0):
                    return "radix4dif_fused"
                if self.n_fft % 8 == 0 and self.hop_length % 512 == 0:
                    return "radix4_fused"
                if self.hop_length % 256 == 0:
                    return "radix2_fused"
            return "radix2"
        return "bf16x3"

    def _use_xla_radix2(self) -> bool:
        """Radix-2 decomposition in plain XLA: half the DFT FLOPs, still
        fusable. Used automatically when the shape qualifies."""
        if self.backend == "xla_radix2":
            return True
        return self.backend == "auto" and self.n_fft % 4 == 0

    @property
    def num_frames(self) -> int:
        return stft_ops.num_frames(self.target_length, self.n_fft, self.hop_length)

    def log_mel(self, waveform: jax.Array) -> jax.Array:
        """Un-normalized log-mel (..., n_mels, T) — the point in the chain
        where SpecAugment applies (reference preprocessing.py:139-146)."""
        if self._use_pallas() or self._auto_pallas(waveform, need_normalize=False):
            return self._pallas_log_mel(waveform, normalize=False)
        if self._use_xla_radix2():
            mel = _log_mel_radix2_xla(
                waveform, self.sample_rate, self.n_fft, self.hop_length,
                self.n_mels, self.mel_scale, self.norm,
                f_min=self.f_min, f_max=self.f_max,
            )
            return amplitude_to_db(mel, stype="power", top_db=self.top_db)
        return log_mel_spectrogram(
            waveform,
            self.sample_rate,
            self.n_fft,
            self.hop_length,
            self.n_mels,
            f_min=self.f_min,
            f_max=self.f_max,
            top_db=self.top_db,
            mel_scale=self.mel_scale,
            norm=self.norm,
            use_matmul_dft=self.use_matmul_dft,
        )

    def _pallas_log_mel(self, waveform: jax.Array, normalize: bool,
                        spec_mask_bounds: jax.Array | None = None) -> jax.Array:
        from audio_classification_icbhi_tpu.ops import pallas_mel

        return pallas_mel.log_mel_pallas(
            waveform,
            self.sample_rate,
            self.n_fft,
            self.hop_length,
            self.n_mels,
            f_min=self.f_min,
            f_max=self.f_max,
            top_db=self.top_db,
            mel_scale=self.mel_scale,
            norm=self.norm,
            algorithm=self._pallas_algorithm(),
            normalize=normalize,
            spec_mask_bounds=spec_mask_bounds,
            dft_passes=self.dft_passes,
        )

    def __call__(self, waveform: jax.Array) -> jax.Array:
        if self._use_pallas() or self._auto_pallas(waveform):
            # normalize rides inside (radix2_fused) or right behind the kernel
            return self._pallas_log_mel(waveform, normalize=self.normalize)
        mel = self.log_mel(waveform)
        if self.normalize:
            mel = normalize_spectrogram(mel)
        return mel

    def pad_or_crop(self, waveform: jax.Array) -> jax.Array:
        """Zero-pad at the end or center-crop to target_length
        (reference preprocessing.py:70-83)."""
        length = waveform.shape[-1]
        if length < self.target_length:
            pad = self.target_length - length
            return jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, pad)])
        if length > self.target_length:
            start = (length - self.target_length) // 2
            return jax.lax.slice_in_dim(
                waveform, start, start + self.target_length, axis=waveform.ndim - 1
            )
        return waveform

    # Static hashability so this object can be a jit static arg.
    def _key(self):
        return (
            self.sample_rate, self.n_mels, self.n_fft, self.hop_length,
            self.target_length, self.f_min, self.f_max, self.top_db,
            self.mel_scale, self.norm,
            self.use_matmul_dft, self.normalize, self.backend,
            self.pallas_algorithm, self.dft_passes,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, MelFrontend) and self._key() == other._key()
