"""Sliding-window analysis engine (one jitted graph per window config).

Replaces the hot path of every reference analyzer
(realtime_analyzer.py:184-271, realtime_analyzer_parallel.py:163-249):
windows are a host-side strided view (no temp files), and window->mel->
logits->softmax runs as a single XLA program over the whole padded window
batch. Window counts are bucketed to multiples of 32 so arbitrary recording
lengths reuse one compilation.

Detection semantics (both reference variants are supported):
- mode="threshold" (realtime_analyzer_parallel.py:217-222, the default for
  all batched analyzers): conf_x = min(p_x + p_both, 1.0);
  has_x = conf_x > threshold (default 0.3).
- mode="legacy" (realtime_analyzer.py:227-232): has_x = p_x > 0.5 or
  p_both > 0.5; confidence p_x + p_both reported UNCLAMPED (can exceed 1.0
  — a reference quirk kept for parity).
"""

from __future__ import annotations

import csv
import functools
import math
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_icbhi_tpu.data import wavio
from audio_classification_icbhi_tpu.inference import ClassifierEngine
from audio_classification_icbhi_tpu.ops import mel as mel_ops

CLASS_MAP = {0: "normal", 1: "crackle", 2: "wheeze", 3: "both"}


@dataclass
class SegmentResult:
    """Per-window result (schema parity: realtime_analyzer.py:31-42)."""

    start_time: float
    end_time: float
    has_crackle: bool
    has_wheeze: bool
    crackle_confidence: float
    wheeze_confidence: float
    normal_confidence: float
    both_confidence: float
    predicted_class: str


class FlexibleMelFrontend:
    """Window-duration-adaptive mel transform
    (reference data/preprocessing_flexible.py:9-154): for windows < 1 s,
    n_fft = min(1024, sr*dur/2) and hop = n_fft/4 (:34-36); spectrograms are
    bilinearly resized to a fixed time axis (>= 32 frames, :118-154) so one
    model graph serves every window size.

    Delegates the mel chain to a MelFrontend with the resolved window
    config, so the analyzer hot path gets the SAME measured auto policy as
    training/inference (ops/mel.py:_auto_pallas): on TPU the default 1-s
    windows (2048/512, no resize needed) run the production radix16dif_fused Pallas
    kernel with the normalize epilogue fused; window configs that need a
    resize still run the kernel for the mel chain (epilogue outside, since
    resize sits between mel and normalize); CPU and kernel-ineligible
    shapes fall back to the XLA radix-2 path.
    """

    def __init__(self, sample_rate: int, n_mels: int, n_fft: int, hop_length: int,
                 duration: float, backend: str = "auto",
                 f_min: float = 0.0, f_max: float | None = None,
                 top_db: float | None = None):
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.duration = duration
        self.target_length = int(sample_rate * duration)
        if duration < 1.0:
            n_fft = min(1024, int(sample_rate * duration / 2))
            hop_length = n_fft // 4
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.target_time_steps = max(int(math.ceil(self.target_length / hop_length)), 32)
        # f_min/f_max/top_db flow through from the checkpoint config so the
        # analyzer computes the SAME features the model trained on
        self._inner = mel_ops.MelFrontend(
            sample_rate=sample_rate, n_mels=n_mels, n_fft=self.n_fft,
            hop_length=self.hop_length, duration=duration,
            f_min=f_min, f_max=f_max, top_db=top_db,
            use_matmul_dft=True, normalize=True, backend=backend,
        )

    @property
    def needs_resize(self) -> bool:
        return self._inner.num_frames != self.target_time_steps

    def __call__(self, wavs: jax.Array) -> jax.Array:
        """(B, L) -> (B, n_mels, T_fixed), normalized."""
        if not self.needs_resize:
            # nothing between mel and normalize: the fused kernel runs its
            # per-example epilogue in VMEM when eligible
            return self._inner(wavs)
        mel = self._inner.log_mel(wavs)
        # bilinear, half-pixel centers == torch align_corners=False (:144-149)
        mel = jax.image.resize(
            mel, mel.shape[:-1] + (self.target_time_steps,), method="bilinear"
        )
        return mel_ops.normalize_spectrogram(mel)


class AnalyzerEngine:
    """Shared core of the analyzer family."""

    def __init__(
        self,
        model_path: str,
        segment_duration: float = 1.0,
        overlap: float = 0.5,
        sample_rate: int | None = None,
        crackle_threshold: float = 0.3,
        wheeze_threshold: float = 0.3,
        mode: str = "threshold",
        max_duration: float | None = 15.0,
        mesh=None,
    ):
        """`mesh` (a jax.sharding.Mesh) shards the window axis across chips —
        the data-parallel analog of sequence parallelism for this workload
        (SURVEY.md §5 long-context row): arbitrary recording length scales by
        splitting windows over the mesh, with one jitted graph. Analyzers
        are single-controller tools: the mesh may span many chips of ONE
        process; multi-host serving shards RECORDINGS across hosts instead
        (each host runs its own engine)."""
        if mode not in ("threshold", "legacy"):
            raise ValueError(f"unknown analyzer mode {mode!r} "
                             "(expected 'threshold' or 'legacy')")
        if not 0.0 <= overlap < 1.0:
            # overlap=1.0 clamps the hop to ONE SAMPLE: a 15 s recording
            # becomes ~224k windows and the padded batch is ~14 GB
            raise ValueError(f"overlap must be in [0, 1), got {overlap}")
        self.mesh = mesh
        self.classifier = ClassifierEngine(model_path)
        dcfg = self.classifier.config["data"]
        # None = the checkpoint's training sample rate; the analyzer wrapper
        # scripts pass 16000 explicitly for reference parity
        # (realtime_analyzer.py:134 hardcodes librosa.load(sr=16000))
        self.sample_rate = sample_rate or dcfg["sample_rate"]
        self.segment_duration = segment_duration
        self.overlap = overlap
        self.crackle_threshold = crackle_threshold
        self.wheeze_threshold = wheeze_threshold
        self.mode = mode
        self.max_duration = max_duration
        self.class_map = CLASS_MAP
        self.frontend = FlexibleMelFrontend(
            sample_rate=self.sample_rate,
            n_mels=dcfg["n_mels"],
            n_fft=dcfg["n_fft"],
            hop_length=dcfg["hop_length"],
            duration=segment_duration,
            f_min=dcfg.get("f_min", 0.0),
            f_max=dcfg.get("f_max"),
            top_db=dcfg.get("top_db"),
        )

    # ---------------------------------------------------------------- audio

    def load_audio(self, audio_path: str) -> np.ndarray:
        """Decode + resample + optional max-duration crop
        (reference realtime_analyzer.py:120-138 loads <=15 s)."""
        print(f"\nLoading audio: {audio_path}")
        audio, sr = wavio.load_audio(audio_path, target_sr=self.sample_rate)
        if self.max_duration is not None:
            audio = audio[: int(self.max_duration * self.sample_rate)]
        print(f"✓ Audio loaded: {len(audio) / self.sample_rate:.2f}s, {sr}Hz")
        return audio

    def segment_audio(self, audio: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (windows (W, seg_samples), starts (W,), ends (W,)).

        Same windowing as reference realtime_analyzer.py:141-182: hop =
        seg*(1-overlap), plus a zero-padded tail window if audio remains.
        """
        seg = int(self.segment_duration * self.sample_rate)
        hop = max(int(seg * (1 - self.overlap)), 1)
        n = len(audio)
        duration = n / self.sample_rate
        # reference loop: range(0, len(audio) - segment_samples + 1, hop) —
        # EMPTY when the recording is shorter than one segment, so short
        # audio becomes a single zero-padded tail window (the old max(...)
        # clamp emitted an UNPADDED short first window, crashing np.stack)
        starts_idx = list(range(0, n - seg + 1, hop))
        tail = None
        next_start = starts_idx[-1] + hop if starts_idx else 0
        if next_start < n:
            tail = next_start
        windows, starts, ends = [], [], []
        for s in starts_idx:
            windows.append(audio[s : s + seg])
            starts.append(s / self.sample_rate)
            ends.append((s + seg) / self.sample_rate)
        if tail is not None:
            w = audio[tail:]
            windows.append(np.pad(w, (0, seg - len(w))))
            starts.append(tail / self.sample_rate)
            ends.append(duration)
        print(
            f"✓ Created {len(windows)} segments ({self.segment_duration}s each, "
            f"{self.overlap * 100:.0f}% overlap)"
        )
        if not windows:  # zero-length audio
            return (np.zeros((0, seg), np.float32), np.zeros(0), np.zeros(0))
        return np.stack(windows).astype(np.float32), np.array(starts), np.array(ends)

    # ---------------------------------------------------------------- jitted path

    @functools.cached_property
    def _probs_fn(self):
        model = self.classifier.model
        params, batch_stats = self.classifier.params, self.classifier.batch_stats
        frontend = self.frontend
        variables = {"params": params, "batch_stats": batch_stats}

        # XLA convs by default (same policy as ClassifierEngine._apply_fn:
        # the fused Pallas chain measured slower on-chip, r5 A/B);
        # ICBHI_FUSED_CNN=1 opts in on the single-device path only — a
        # pallas_call under a sharded jit would need explicit partitioning
        # rules, so the mesh path always keeps flax
        from audio_classification_icbhi_tpu.models import LightweightCNN
        from audio_classification_icbhi_tpu.models.fused_infer import (
            fused_cnn_enabled, make_fused_apply)

        if (self.mesh is None and isinstance(model, LightweightCNN)
                and fused_cnn_enabled((1, frontend.n_mels, 4, 1))):
            # width is trace-time; the kernels handle any T >= 4
            apply_fn = make_fused_apply(variables)
        else:
            apply_fn = lambda feats: model.apply(variables, feats, train=False)  # noqa: E731

        def probs_fn(windows):
            mel = frontend(windows)[..., None]  # (W, n_mels, T, 1)
            return jax.nn.softmax(apply_fn(mel), axis=-1)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = self.mesh.axis_names[0]
            sharded = NamedSharding(self.mesh, P(axis))
            return jax.jit(probs_fn, in_shardings=sharded, out_shardings=sharded)
        return jax.jit(probs_fn)

    def _window_bucket(self, w: int) -> int:
        quantum = 32
        if self.mesh is not None:
            quantum = math.lcm(32, int(self.mesh.devices.size))
        return max(quantum, int(math.ceil(w / quantum)) * quantum)

    def predict_window_probs(self, windows: np.ndarray) -> np.ndarray:
        """Bucket window count (multiples of 32, and of the mesh size when
        sharded), one jitted call."""
        w = windows.shape[0]
        bucket = self._window_bucket(w)
        if w < bucket:
            windows = np.concatenate(
                [windows, np.zeros((bucket - w,) + windows.shape[1:], windows.dtype)]
            )
        return np.asarray(self._probs_fn(jnp.asarray(windows)))[:w]

    # ---------------------------------------------------------------- results

    def _make_result(self, probs: np.ndarray, start: float, end: float) -> SegmentResult:
        normal_conf, crackle_conf, wheeze_conf, both_conf = (float(p) for p in probs[:4])
        if self.mode == "legacy":
            has_crackle = crackle_conf > 0.5 or both_conf > 0.5
            has_wheeze = wheeze_conf > 0.5 or both_conf > 0.5
            total_crackle = crackle_conf + both_conf  # unclamped (quirk kept)
            total_wheeze = wheeze_conf + both_conf
        else:
            total_crackle = min(crackle_conf + both_conf, 1.0)
            total_wheeze = min(wheeze_conf + both_conf, 1.0)
            has_crackle = total_crackle > self.crackle_threshold
            has_wheeze = total_wheeze > self.wheeze_threshold
        return SegmentResult(
            start_time=start,
            end_time=end,
            has_crackle=has_crackle,
            has_wheeze=has_wheeze,
            crackle_confidence=total_crackle,
            wheeze_confidence=total_wheeze,
            normal_confidence=normal_conf,
            both_confidence=both_conf,
            predicted_class=self.class_map[int(np.argmax(probs))],
        )

    def analyze_audio(self, audio_path: str) -> tuple[list[SegmentResult], np.ndarray]:
        """-> (results, audio) (contract: realtime_analyzer_parallel.py:251-257)."""
        audio = self.load_audio(audio_path)
        windows, starts, ends = self.segment_audio(audio)
        probs = self.predict_window_probs(windows)
        results = [
            self._make_result(p, s, e) for p, s, e in zip(probs, starts, ends)
        ]
        return results, audio

    # ---------------------------------------------------------------- reporting

    def print_summary(self, results: list[SegmentResult]) -> None:
        """Reference realtime_analyzer.py:386-427."""
        total = max(len(results), 1)
        crackle = sum(1 for r in results if r.has_crackle)
        wheeze = sum(1 for r in results if r.has_wheeze)
        both = sum(1 for r in results if r.has_crackle and r.has_wheeze)
        normal = sum(1 for r in results if not r.has_crackle and not r.has_wheeze)
        print("\n" + "=" * 70)
        print("ANALYSIS SUMMARY")
        print("=" * 70)
        print(f"Total segments analyzed: {len(results)}")
        print(f"Normal segments: {normal} ({100 * normal / total:.1f}%)")
        print(f"Crackle detections: {crackle} ({100 * crackle / total:.1f}%)")
        print(f"Wheeze detections: {wheeze} ({100 * wheeze / total:.1f}%)")
        print(f"Both detected: {both} ({100 * both / total:.1f}%)")
        for label, flag in (("Crackle", "has_crackle"), ("Wheeze", "has_wheeze")):
            times = [(r.start_time, r.end_time) for r in results if getattr(r, flag)]
            if times:
                print(f"\n{label} time ranges:")
                for s, e in times[:5]:
                    print(f"  {s:.2f}s - {e:.2f}s")
                if len(times) > 5:
                    print(f"  ... and {len(times) - 5} more")
        print("=" * 70)

    def export_results(self, results: list[SegmentResult], output_path: str) -> None:
        """CSV schema parity: realtime_analyzer.py:427-464."""
        with open(output_path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(
                ["Start (s)", "End (s)", "Crackle", "Wheeze",
                 "Crackle Conf", "Wheeze Conf", "Class"]
            )
            for r in results:
                writer.writerow(
                    [f"{r.start_time:.3f}", f"{r.end_time:.3f}",
                     r.has_crackle, r.has_wheeze,
                     f"{r.crackle_confidence:.4f}", f"{r.wheeze_confidence:.4f}",
                     r.predicted_class]
                )
        print(f"✓ Results exported to: {output_path}")

    def export_results_timeline(self, results: list[SegmentResult], output_path: str) -> None:
        """Timeline CSV with Detection Type column
        (reference realtime_analyzer_timeline.py:449-484)."""
        with open(output_path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(
                ["Start (s)", "End (s)", "Detection Type", "Has Crackle", "Has Wheeze",
                 "Crackle Confidence", "Wheeze Confidence", "Predicted Class"]
            )
            for r in results:
                if r.has_crackle and r.has_wheeze:
                    det = "Both"
                elif r.has_crackle:
                    det = "Crackle"
                elif r.has_wheeze:
                    det = "Wheeze"
                else:
                    det = "Normal"
                writer.writerow(
                    [f"{r.start_time:.3f}", f"{r.end_time:.3f}", det,
                     r.has_crackle, r.has_wheeze,
                     f"{r.crackle_confidence:.4f}", f"{r.wheeze_confidence:.4f}",
                     r.predicted_class]
                )
        print(f"✓ Results exported to: {output_path}")
