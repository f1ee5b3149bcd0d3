"""Synthetic ICBHI-like data generation.

The real ICBHI 2017 database is not shipped in this image (the reference
assumes it is downloaded separately, reference README.md), so tests, demos,
and benchmarks run on synthetic respiratory audio that exercises the same
code paths: breathing-noise base, crackle transients (short wideband
bursts), and wheeze tones (sustained 100-1000 Hz whistles) — the acoustic
signatures the ICBHI literature describes.

`generate_icbhi_dataset` writes the reference's whole-recording layout
(audio_and_txt_files/*.wav + tab-separated annotation txt, see reference
src/data/dataset.py:15-21), `generate_segmented_dataset` writes the per-class
directory layout (reference dataset_segmented.py:15-27).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from audio_classification_icbhi_tpu.data.annotations import SEGMENT_DIR_NAMES
from audio_classification_icbhi_tpu.data.wavio import write_wav


def _breath_noise(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    """Low-passed noise amplitude-modulated at a breathing rate (~0.3 Hz)."""
    noise = rng.standard_normal(n + 64)
    kernel = np.hanning(65)
    kernel /= kernel.sum()
    lp = np.convolve(noise, kernel, mode="valid")[:n]
    t = np.arange(n) / sr
    phase = rng.uniform(0, 2 * np.pi)
    envelope = 0.55 + 0.45 * np.sin(2 * np.pi * 0.3 * t + phase)
    return (lp * envelope).astype(np.float32)


def _add_crackles(rng: np.random.Generator, x: np.ndarray, sr: int, density: float = 6.0):
    """Short (~5 ms) damped wideband bursts."""
    n = len(x)
    num = max(1, int(density * n / sr))
    for _ in range(num):
        pos = rng.integers(0, n - 128)
        burst = rng.standard_normal(128) * np.exp(-np.arange(128) / 20.0)
        x[pos : pos + 128] += 0.9 * burst.astype(np.float32)
    return x


def _add_wheeze(rng: np.random.Generator, x: np.ndarray, sr: int):
    """Sustained tonal whistle with slight vibrato, 200-800 Hz."""
    n = len(x)
    t = np.arange(n) / sr
    f0 = rng.uniform(200, 800)
    vibrato = 1.0 + 0.02 * np.sin(2 * np.pi * 4.0 * t)
    tone = np.sin(2 * np.pi * f0 * vibrato * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
    envelope = 0.5 + 0.5 * np.sin(2 * np.pi * 0.3 * t + rng.uniform(0, 2 * np.pi))
    x += (0.5 * tone * envelope).astype(np.float32)
    return x


def synth_respiratory_cycle(
    rng: np.random.Generator,
    label: int,
    duration: float = 2.5,
    sample_rate: int = 16000,
) -> np.ndarray:
    """One synthetic breathing cycle of class label (0=normal 1=crackles
    2=wheezes 3=both), float32 in [-1, 1]."""
    n = int(duration * sample_rate)
    x = 0.3 * _breath_noise(rng, n, sample_rate)
    if label in (1, 3):
        x = _add_crackles(rng, x, sample_rate)
    if label in (2, 3):
        x = _add_wheeze(rng, x, sample_rate)
    peak = np.abs(x).max()
    if peak > 0.99:
        x = 0.99 * x / peak
    return x.astype(np.float32)


def generate_icbhi_dataset(
    root: str | Path,
    num_recordings: int = 24,
    cycles_per_recording: int = 4,
    sample_rate: int = 16000,
    seed: int = 0,
) -> Path:
    """Write a whole-recording layout dataset: root/audio_and_txt_files/
    {name}.wav + {name}.txt with tab-separated cycle annotations."""
    rng = np.random.default_rng(seed)
    audio_dir = Path(root) / "audio_and_txt_files"
    audio_dir.mkdir(parents=True, exist_ok=True)
    for r in range(num_recordings):
        cycles = []
        audio = []
        t0 = 0.0
        for _ in range(cycles_per_recording):
            label = int(rng.integers(0, 4))
            dur = float(rng.uniform(1.5, 3.0))
            audio.append(synth_respiratory_cycle(rng, label, dur, sample_rate))
            crackle = 1 if label in (1, 3) else 0
            wheeze = 1 if label in (2, 3) else 0
            cycles.append((t0, t0 + dur, crackle, wheeze))
            t0 += dur
        wav = np.concatenate(audio)
        # Filenames follow the ICBHI convention: {patient}_{idx}_{chest}_{mode}_{device}
        name = f"{101 + r}_1b1_Al_sc_Synth"
        write_wav(audio_dir / f"{name}.wav", wav, sample_rate)
        lines = [f"{s:.3f}\t{e:.3f}\t{c}\t{w}" for s, e, c, w in cycles]
        (audio_dir / f"{name}.txt").write_text("\n".join(lines) + "\n")
    return Path(root)


def generate_segmented_dataset(
    root: str | Path,
    per_class: int = 8,
    duration: float = 2.5,
    sample_rate: int = 16000,
    seed: int = 0,
) -> Path:
    """Write the segmented per-class layout: root/{normal,crackle,wheeze,both}/*.wav."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    for label, dirname in enumerate(SEGMENT_DIR_NAMES):
        d = root / dirname
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            wav = synth_respiratory_cycle(rng, label, duration, sample_rate)
            write_wav(d / f"{101 + i}_1b1_Al_sc_Synth_seg{i:03d}_{dirname}.wav", wav, sample_rate)
    return root
