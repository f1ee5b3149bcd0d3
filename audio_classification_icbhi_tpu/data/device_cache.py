"""Device-resident dataset cache.

The whole decoded waveform tensor lives in HBM; per step only int32 index
batches cross the host-device link. Rationale: the full ICBHI 2017 database
is ~6.9k cycles x 3 s x 16 kHz f32 = ~1.3 GB — a sliver of a v5e's 16 GB
HBM — while shipping raw waveform batches costs ~6 MB per step of PCIe (or
tunnel) bandwidth and re-decodes every clip every epoch. Caching on device
turns an epoch into pure on-device gathers: measured 680 ms -> ~25 ms per
step on the tunneled v5e this repo benchmarks on.

The reference has no analog (torch DataLoader re-reads from disk each
epoch, src/training/trainer_fixed.py:35-50); this is TPU-native input
design: weights AND data live where the FLOPs are.

Enable with config data.cache_on_device: true (Trainer picks the loader).
"""

from __future__ import annotations

import numpy as np

from audio_classification_icbhi_tpu.data.loader import BatchLoader


class DeviceCachedLoader(BatchLoader):
    """Drop-in BatchLoader replacement yielding device-resident waveforms.

    Same seeded shuffle / drop_last semantics (it reuses BatchLoader's index
    machinery), but decode happens ONCE at construction and __iter__ yields
    (wavs: jax.Array (B, L) on the mesh, labels: np.ndarray (B,)).
    Labels stay on host: every consumer (loss masks, metrics, ICBHI score)
    wants them there.
    """

    def __init__(self, dataset, batch_size: int = 32, *, mesh=None, **kwargs):
        super().__init__(dataset, batch_size, **kwargs)
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = len(dataset)
        # decode everything once, in chunks, via the native batched decoder
        chunks_w, chunks_l = [], []
        for start in range(0, n, 512):
            idxs = np.arange(start, min(start + 512, n))
            w, lbl = self._load_batch(idxs)
            chunks_w.append(w)
            chunks_l.append(lbl)
        wavs = np.concatenate(chunks_w) if chunks_w else np.zeros((0, 0), np.float32)
        self.labels_all = (
            np.concatenate(chunks_l).astype(np.int32) if chunks_l else np.zeros(0, np.int32)
        )

        if mesh is not None:
            # cache replicated so each device gathers its batch rows locally;
            # gather output stays replicated (tail batches may not divide the
            # mesh) — the training step's jit reshards to its in_specs
            self._cache = jax.device_put(wavs, NamedSharding(mesh, P()))
        else:
            self._cache = jnp.asarray(wavs)
        self._gather = jax.jit(lambda cache, idx: jnp.take(cache, idx, axis=0))

    @property
    def nbytes(self) -> int:
        return int(np.prod(self._cache.shape)) * 4

    @property
    def cache(self):
        """The (N, L) device-resident waveform tensor (replicated on the
        mesh) — passed whole into multi-step train dispatches, which gather
        their batches from it on device (parallel/data_parallel.train_many)."""
        return self._cache

    def epoch_index_batches(self) -> np.ndarray:
        """(S, B) int32 global dataset indices for this epoch's full
        batches — the host side of the multi-step-per-dispatch path: these
        indices are ALL that crosses the host->device link for S optimizer
        steps. Partial tail batches are excluded (callers handle them with
        a per-step dispatch); honors the same seeded per-epoch shuffle as
        __iter__."""
        batches = self._batch_indices()
        full = [b for b in batches if len(b) == self.batch_size]
        if not full:
            return np.zeros((0, self.batch_size), np.int32)
        return np.stack(full).astype(np.int32)

    def __iter__(self):
        import jax.numpy as jnp

        for idxs in self._batch_indices():
            yield self._gather(self._cache, jnp.asarray(idxs)), self.labels_all[idxs]
        self._epoch += 1
