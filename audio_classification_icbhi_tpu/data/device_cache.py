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

Storage dtype: 16-bit-PCM-sourced audio (the whole ICBHI corpus) is kept
in HBM as int16 and dequantized on device inside the gather — bit-exact
by a verified round-trip at construction (see _pcm16_quantize), and it
halves both the one-time host->device upload (the dominant cold-start
cost through a tunneled chip) and the cache's HBM footprint. Data that
does not round-trip (resampled/normalized/float WAVs) silently stays
fp32. config data.cache_dtype: auto (default) / float32 / int16.

Enable with config data.cache_on_device: true (Trainer picks the loader).
"""

from __future__ import annotations

import numpy as np

from audio_classification_icbhi_tpu.data.loader import BatchLoader


def dequantize(wavs):
    """Exact int16 -> float32 PCM dequant (x * 2^-15) for gathers out of a
    PCM16-stored cache; identity on anything else. dtype is static under
    jit, so the float32 path compiles to nothing and the int16 path fuses
    into the consuming program (both decoders use the same /32768
    convention: data/wavio.py:91, native/fastwav.cc:163)."""
    import jax.numpy as jnp

    if wavs.dtype == jnp.int16:
        return wavs.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return wavs


def _pcm16_quantize(wavs: np.ndarray) -> np.ndarray | None:
    """int16 image of a float32 waveform tensor when q = rint(x * 32768)
    dequantizes back EXACTLY (q * 2^-15 == x for every sample) — true
    whenever the data came from 16-bit PCM WAVs through this package's
    decoders and was only cropped/zero-padded since. Returns None on any
    sample that does not round-trip (resampled, normalized, float-source,
    out-of-range or non-finite audio), so callers can fall back to the
    float32 cache with numerics untouched. Chunked: peak extra memory is
    ~16 MB regardless of dataset size."""
    if wavs.dtype != np.float32 or wavs.size == 0 or wavs.ndim < 1:
        return None
    out = np.empty(wavs.shape, np.int16)
    flat_in = wavs.reshape(wavs.shape[0], -1) if wavs.ndim > 1 else wavs[None]
    flat_out = out.reshape(flat_in.shape)
    rows_per_chunk = max(1, (1 << 22) // max(flat_in.shape[-1], 1))
    for s in range(0, flat_in.shape[0], rows_per_chunk):
        w = flat_in[s:s + rows_per_chunk]
        q = np.rint(w * np.float32(32768.0))
        if not np.isfinite(q).all() or q.min() < -32768 or q.max() > 32767:
            return None
        qi = q.astype(np.int16)
        # ground truth: the on-device dequant must reproduce w bit-exactly
        if not np.array_equal(qi.astype(np.float32) / np.float32(32768.0), w):
            return None
        flat_out[s:s + rows_per_chunk] = qi
    return out


class DeviceCachedLoader(BatchLoader):
    """Drop-in BatchLoader replacement yielding device-resident waveforms.

    Same seeded shuffle / drop_last semantics (it reuses BatchLoader's index
    machinery), but decode happens ONCE at construction and __iter__ yields
    (wavs: jax.Array (B, L) on the mesh, labels: np.ndarray (B,)).
    Labels stay on host: every consumer (loss masks, metrics, ICBHI score)
    wants them there.
    """

    def __init__(self, dataset, batch_size: int = 32, *, mesh=None,
                 cache_dtype: str = "auto", **kwargs):
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

        # Lossless PCM16 storage (config data.cache_dtype, default "auto"):
        # when every sample round-trips rint(x*32768)/32768 exactly — true
        # for 16-bit-PCM-sourced audio that was only cropped/zero-padded —
        # the cache is stored and shipped as int16 and gathers dequantize on
        # device, halving both the one-time host->device upload (the
        # dominant cold-start cost on a tunneled chip: ~1.2 GB of fp32 for
        # ICBHI-scale data) and the HBM footprint, with numerics bit-exact
        # by construction. "float32" forces the old behavior; "int16"
        # asserts losslessness instead of falling back.
        if cache_dtype not in ("auto", "int16", "float32"):
            raise ValueError(f"cache_dtype must be auto|int16|float32, got {cache_dtype!r}")
        stored = wavs
        if cache_dtype in ("auto", "int16"):
            q = _pcm16_quantize(wavs)
            if q is not None:
                stored = q
            elif cache_dtype == "int16":
                raise ValueError(
                    "data.cache_dtype=int16: waveforms do not round-trip PCM16 "
                    "losslessly (resampled/normalized/float-source audio); use "
                    "'auto' or 'float32'"
                )

        if mesh is not None:
            # cache replicated so each device gathers its batch rows locally;
            # gather output stays replicated (tail batches may not divide the
            # mesh) — the training step's jit reshards to its in_specs
            self._cache = jax.device_put(stored, NamedSharding(mesh, P()))
        else:
            self._cache = jnp.asarray(stored)
        self._gather = jax.jit(
            lambda cache, idx: dequantize(jnp.take(cache, idx, axis=0))
        )

    @property
    def nbytes(self) -> int:
        return int(np.prod(self._cache.shape)) * self._cache.dtype.itemsize

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
