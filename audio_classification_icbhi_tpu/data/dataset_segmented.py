"""Segmented (per-cycle) ICBHI dataset index.

Same data contract as reference ICBHISegmentedDataset
(src/data/dataset_segmented.py:11-138): per-class directories
normal/ crackle/ wheeze/ both/, seed-42 shuffle for consistent splits
(:89-91), train/val split fractions read from config (:99-104), class
distribution printed per split (:118-126).

Documented deviation from the reference: config_segmented.yaml ships
val_split=0.45 / test_split=0.35, which with train_split=0.75 sums past 1.0
and leaves the test split empty (SURVEY.md quirk ledger). When the
configured fractions sum above 1.0 we renormalize val to (1 - train) * 0.5
and warn, instead of silently producing an empty test set.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Any

import numpy as np

from audio_classification_icbhi_tpu.data import wavio
from audio_classification_icbhi_tpu.data.annotations import SEGMENT_DIR_NAMES


class ICBHISegmentedDataset:
    """Index of per-cycle wav segments with host-side fixed-shape loading."""

    CLASS_MAP = {name: i for i, name in enumerate(SEGMENT_DIR_NAMES)}

    def __init__(
        self,
        root_dir: str | Path,
        split: str = "train",
        config: dict[str, Any] | None = None,
        augment: bool = False,
    ):
        self.root_dir = Path(root_dir)
        self.split = split
        self.augment = augment and split == "train"
        data_cfg = (config or {}).get("data", {})
        self.sample_rate = int(data_cfg.get("sample_rate", 16000))
        self.duration = float(data_cfg.get("duration", 3.0))
        self.target_length = int(self.sample_rate * self.duration)
        self.data = self._load_index()
        self._split_data(config)

    def _load_index(self) -> list[tuple[str, int]]:
        data = []
        for class_name, class_idx in self.CLASS_MAP.items():
            class_dir = self.root_dir / class_name
            if not class_dir.exists():
                print(f"Warning: Directory not found: {class_dir}")
                continue
            for wav_file in sorted(class_dir.glob("*.wav")):
                data.append((str(wav_file), class_idx))
        if not data:
            raise ValueError(f"No audio files found in {self.root_dir}")
        # Seeded shuffle for consistent splits (reference :89-91).
        random.Random(42).shuffle(data)
        return data

    def _split_data(self, config):
        total = len(self.data)
        # same tolerant section lookup as __init__ (a config without a
        # "data" section used to KeyError here while __init__ accepted it)
        data_cfg = (config or {}).get("data", {})
        train_split = data_cfg.get("train_split", 0.7)
        val_split = data_cfg.get("val_split", 0.15)
        if train_split + val_split >= 1.0:
            fixed = (1.0 - train_split) * 0.5
            print(
                f"Warning: train_split+val_split = {train_split + val_split:.2f} >= 1; "
                f"renormalizing val_split {val_split} -> {fixed:.3f} so the test split "
                "is non-empty (documented deviation from the reference, which would "
                "produce an empty test set here)."
            )
            val_split = fixed
        train_size = int(train_split * total)
        val_size = int(val_split * total)
        if self.split == "train":
            self.data = self.data[:train_size]
        elif self.split == "val":
            self.data = self.data[train_size : train_size + val_size]
        else:
            self.data = self.data[train_size + val_size :]
        print(f"Loaded {len(self.data)} samples for {self.split} split")
        class_counts: dict[str, int] = {}
        inv = {v: k for k, v in self.CLASS_MAP.items()}
        for _, label in self.data:
            name = inv[label]
            class_counts[name] = class_counts.get(name, 0) + 1
        print(f"Class distribution for {self.split}:")
        for class_name, count in sorted(class_counts.items()):
            print(f"  {class_name}: {count} ({100 * count / max(len(self.data), 1):.1f}%)")

    def __len__(self) -> int:
        return len(self.data)

    @property
    def labels(self) -> np.ndarray:
        return np.array([lbl for _, lbl in self.data], dtype=np.int32)

    def _pad_or_crop(self, x: np.ndarray) -> np.ndarray:
        from audio_classification_icbhi_tpu.data.wavio import pad_or_crop

        return pad_or_crop(x, self.target_length)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, int]:
        path, label = self.data[idx]
        wav, _ = wavio.load_audio(path, target_sr=self.sample_rate)
        return self._pad_or_crop(wav).astype(np.float32), label

    def load_batch(self, idxs) -> tuple[np.ndarray, np.ndarray]:
        """Batched load via the native threaded decoder (see dataset.py)."""
        from audio_classification_icbhi_tpu.data.dataset import _native_load_batch

        return _native_load_batch(self, idxs)
