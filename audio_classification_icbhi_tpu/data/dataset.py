"""Whole-recording ICBHI dataset index.

Same data contract as reference ICBHIDataset (src/data/dataset.py:11-147):
glob `audio_and_txt_files/*.wav` sorted, pair each with its annotation txt,
label at recording level, positional 70/15/15 split over the sorted list
(reference dataset.py:81-90 — kept faithfully, including its non-shuffled,
non-patient-disjoint nature, which is documented in SURVEY.md's quirk
ledger).

TPU-first difference: __getitem__ returns the *fixed-length waveform*
(decoded, mono, resampled, padded/cropped on the host) plus the label; the
mel transform and augmentation happen on-device inside the jitted step, not
here. A `spectrogram_item` helper exists for parity tooling.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from audio_classification_icbhi_tpu.data import wavio
from audio_classification_icbhi_tpu.data.annotations import recording_label


def _native_load_batch(dataset, idxs) -> tuple[np.ndarray, np.ndarray]:
    """Shared native fast path for the fixed-shape datasets."""
    from audio_classification_icbhi_tpu import native

    idxs = [int(i) for i in idxs]
    labels = np.asarray([dataset.data[i][1] for i in idxs], dtype=np.int32)
    paths = [dataset.data[i][0] for i in idxs]
    if native.available():
        decoded = native.decode_batch(paths, dataset.target_length, n_threads=4)
        if decoded is not None:
            batch, srs, _ = decoded
            for row, i in enumerate(idxs):
                if srs[row] != dataset.sample_rate:  # wrong rate or decode error
                    batch[row] = dataset[i][0]
            return batch, labels
    return (
        np.stack([dataset[i][0] for i in idxs]).astype(np.float32),
        labels,
    )


class ICBHIDataset:
    """Index of (wav_path, label) with host-side fixed-shape waveform loading."""

    def __init__(
        self,
        root_dir: str | Path,
        split: str = "train",
        config: dict[str, Any] | None = None,
        augment: bool = False,
    ):
        self.root_dir = Path(root_dir)
        self.split = split
        # augment flag is recorded for the trainer (on-device augmentation);
        # only active for train split, mirroring reference dataset.py:38.
        self.augment = augment and split == "train"
        data_cfg = (config or {}).get("data", {})
        self.sample_rate = int(data_cfg.get("sample_rate", 16000))
        self.duration = float(data_cfg.get("duration", 5.0))
        self.target_length = int(self.sample_rate * self.duration)
        self.data = self._load_index()

    def _load_index(self) -> list[tuple[str, int]]:
        audio_dir = self.root_dir / "audio_and_txt_files"
        if not audio_dir.exists():
            raise ValueError(f"Audio directory not found: {audio_dir}")
        data = []
        for wav_file in sorted(audio_dir.glob("*.wav")):
            txt_file = wav_file.with_suffix(".txt")
            if txt_file.exists():
                data.append((str(wav_file), recording_label(txt_file)))
        total = len(data)
        train_size = int(0.7 * total)
        val_size = int(0.15 * total)
        if self.split == "train":
            data = data[:train_size]
        elif self.split == "val":
            data = data[train_size : train_size + val_size]
        else:  # test
            data = data[train_size + val_size :]
        print(f"Loaded {len(data)} samples for {self.split} split")
        return data

    def __len__(self) -> int:
        return len(self.data)

    @property
    def labels(self) -> np.ndarray:
        return np.array([lbl for _, lbl in self.data], dtype=np.int32)

    def _pad_or_crop(self, x: np.ndarray) -> np.ndarray:
        from audio_classification_icbhi_tpu.data.wavio import pad_or_crop

        return pad_or_crop(x, self.target_length)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, int]:
        """-> ((target_length,) float32 waveform, label)."""
        path, label = self.data[idx]
        wav, _ = wavio.load_audio(path, target_sr=self.sample_rate)
        return self._pad_or_crop(wav).astype(np.float32), label

    def load_batch(self, idxs) -> tuple[np.ndarray, np.ndarray]:
        """Batched load via the native threaded decoder (one C++ call decodes,
        mono-mixes, pads/center-crops every file straight into the batch
        buffer); files whose sample rate differs fall back to the resampling
        path per row."""
        return _native_load_batch(self, idxs)
