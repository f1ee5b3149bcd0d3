"""Checkpoint-driven inference engine.

The model is rebuilt from the config EMBEDDED in the checkpoint — the
self-describing-checkpoint contract the reference establishes
(reference cli.py:16-41, validate.py:46-54): consumers never need the
original YAML.

One jitted wav->(probs) graph serves single-clip and batch classification;
batches are padded to a fixed shape so the graph compiles once.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from audio_classification_icbhi_tpu.data import wavio
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.ops.mel import MelFrontend
from audio_classification_icbhi_tpu.parallel.data_parallel import features_from_wavs
from audio_classification_icbhi_tpu.utils.checkpoint import load_checkpoint


class ClassifierEngine:
    """wav -> 4-class probabilities from a self-describing checkpoint."""

    def __init__(self, checkpoint_path: str | Path, batch_size: int = 32,
                 config: dict | None = None):
        """config: fallback when the checkpoint has no embedded config —
        lets entry points honor the reference's config-file fallback
        (validate.py:46-54); the embedded config still wins when present."""
        from audio_classification_icbhi_tpu.utils.config import ensure_compile_cache

        ensure_compile_cache()
        ckpt = load_checkpoint(checkpoint_path)
        if "config" not in ckpt and config is None:
            raise ValueError(f"checkpoint {checkpoint_path} has no embedded config")
        self.config: dict[str, Any] = ckpt.get("config") or config
        self.class_names: list[str] = list(self.config["classes"])
        self.batch_size = batch_size
        self.frontend = MelFrontend.from_config(self.config)
        self.model = build_model(self.config)
        # bind restored state onto a template of the right pytree structure
        # (one jitted init program: eager init is slow through the TPU tunnel)
        from audio_classification_icbhi_tpu.models.registry import init_variables

        template = init_variables(
            self.model, jax.random.PRNGKey(0),
            (1, self.frontend.n_mels, self.frontend.num_frames, 1),
        )
        self.params = serialization.from_state_dict(template["params"], ckpt["params"])
        self.batch_stats = serialization.from_state_dict(
            template.get("batch_stats", {}), ckpt.get("batch_stats", {})
        )
        self.epoch = int(ckpt.get("epoch", -1))
        self.val_loss = float(ckpt.get("val_loss", float("nan")))
        self.extras = {
            k: ckpt[k] for k in ("icbhi_score", "icbhi_metrics") if k in ckpt
        }

    @functools.cached_property
    def _apply_fn(self):
        """feats -> logits for the eval path.

        The flax/XLA apply everywhere by default; `ICBHI_FUSED_CNN=1`
        (with the LightweightCNN profile on TPU) opts into the fused
        Pallas conv kernels, which the r5 on-chip A/B measured slower
        despite their HBM-byte win (models/fused_infer.fused_cnn_enabled
        has the numbers).
        """
        from audio_classification_icbhi_tpu.models import LightweightCNN
        from audio_classification_icbhi_tpu.models.fused_infer import (
            fused_cnn_enabled, make_fused_apply)

        variables = {"params": self.params, "batch_stats": self.batch_stats}
        shape = (1, self.frontend.n_mels, self.frontend.num_frames, 1)
        if isinstance(self.model, LightweightCNN) and fused_cnn_enabled(shape):
            return make_fused_apply(variables)
        model = self.model
        return lambda feats: model.apply(variables, feats, train=False)

    @functools.cached_property
    def _probs_fn(self):
        frontend, apply_fn = self.frontend, self._apply_fn

        @jax.jit
        def probs_fn(wavs):
            feats = features_from_wavs(frontend, wavs)
            return jax.nn.softmax(apply_fn(feats), axis=-1)

        return probs_fn

    @functools.cached_property
    def _packed1_fn(self):
        """Latency mode: a pre-compiled BATCH-1 wav -> packed
        [probs_0..probs_{C-1}, argmax] program.

        A synchronous single-clip call costs one dispatch plus one
        device->host fetch; on remote/tunneled devices the per-RPC
        round-trip dominates the sub-millisecond compute (see
        benchmarks/headline_bench.py's decomposition), so the argmax is
        computed ON DEVICE and packed into the same (C+1,) array as the
        probabilities — exactly one small fetch per classification.
        Matches the reference's per-sample inference claim surface
        (reference README.md:159,178, cli.py:44-66).
        """
        frontend, apply_fn = self.frontend, self._apply_fn

        @jax.jit
        def packed1(wav):  # (target_length,)
            feats = features_from_wavs(frontend, wav[None])
            logits = apply_fn(feats)
            probs = jax.nn.softmax(logits[0].astype(jnp.float32), axis=-1)
            arg = jnp.argmax(probs).astype(probs.dtype)
            return jnp.concatenate([probs, arg[None]])

        return packed1

    def warmup_latency(self) -> None:
        """Compile + warm the batch-1 latency program (call before serving).
        Warms BOTH input placements a server can present: a host numpy
        array (first call — the compile), then a committed device-resident
        array (a device input can carry a different layout than the
        host-transfer path and trigger one more one-time specialization,
        which a latency-sensitive first request must not pay)."""
        zero = np.zeros((self.frontend.target_length,), np.float32)
        self.classify_wave(zero)
        self.classify_wave(jax.device_put(jnp.asarray(zero)))

    def classify_wave(self, wav: np.ndarray) -> dict:
        """Low-latency single-clip classify: `wav` is a (target_length,)
        float32 waveform at the config sample rate (decode/resample with
        classify_file when starting from a file). One pre-compiled program,
        one packed fetch; same result schema as classify_file."""
        packed = np.asarray(self._packed1_fn(jnp.asarray(wav, jnp.float32)))
        probs, pred = packed[:-1], int(packed[-1])
        return {
            "predicted_class": self.class_names[pred],
            "confidence": float(probs[pred]),
            "probabilities": {
                self.class_names[i]: float(probs[i]) for i in range(len(self.class_names))
            },
        }

    def predict_probs(self, wavs: np.ndarray) -> np.ndarray:
        """(B, target_length) waveforms -> (B, C) probabilities; pads the
        batch to self.batch_size so the graph compiles once."""
        b = wavs.shape[0]
        out = []
        for i in range(0, b, self.batch_size):
            chunk = wavs[i : i + self.batch_size]
            n = chunk.shape[0]
            if n < self.batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((self.batch_size - n,) + chunk.shape[1:], chunk.dtype)]
                )
            out.append(np.asarray(self._probs_fn(jnp.asarray(chunk)))[:n])
        return np.concatenate(out)

    def _load_clip(self, audio_path: str | Path) -> np.ndarray:
        wav, _ = wavio.load_audio(audio_path, target_sr=self.frontend.sample_rate)
        return wavio.pad_or_crop(wav, self.frontend.target_length).astype(np.float32)

    def classify_file(self, audio_path: str | Path) -> dict:
        """Single-file result dict, same schema as reference cli.py:44-66.
        Routes through the batch-1 latency program — a lone clip should not
        pay for a padded batch_size-wide dispatch."""
        wav = self._load_clip(audio_path)
        return {"audio_path": str(audio_path), **self.classify_wave(wav)}

    def classify_files(self, audio_paths: list) -> list[dict]:
        """True batched multi-file classification (the reference's
        classify-batch loops one file at a time, cli.py:140-145)."""
        wavs, ok_paths, results = [], [], []
        for p in audio_paths:
            try:
                wavs.append(self._load_clip(p))
                ok_paths.append(p)
            except Exception as e:
                print(f"Error processing {p}: {e}")
        if not wavs:
            return results
        probs = self.predict_probs(np.stack(wavs))
        for path, pr in zip(ok_paths, probs):
            pred = int(np.argmax(pr))
            results.append(
                {
                    "audio_path": str(path),
                    "predicted_class": self.class_names[pred],
                    "confidence": float(pr[pred]),
                    "probabilities": {
                        self.class_names[i]: float(pr[i])
                        for i in range(len(self.class_names))
                    },
                }
            )
        return results

    def describe(self) -> dict:
        """Model info for `cli.py info` (reference cli.py:171-195)."""
        from audio_classification_icbhi_tpu.models import count_parameters

        return {
            "architecture": self.config["model"]["architecture"],
            "num_classes": self.config["model"]["num_classes"],
            "parameters": count_parameters(self.params),
            "epoch": self.epoch,
            "val_loss": self.val_loss,
            "classes": self.class_names,
            "sample_rate": self.config["data"]["sample_rate"],
            "n_mels": self.config["data"]["n_mels"],
            "duration": self.config["data"]["duration"],
            **self.extras,
        }
