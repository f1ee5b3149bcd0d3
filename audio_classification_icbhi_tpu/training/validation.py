"""Validation runner collecting (y_true, y_pred, y_prob).

Capability match for reference Validator
(src/training/validation.py:9-61; byte-identical duplicate validate.py):
batched no-grad forward over a dataset, softmax probabilities, argmax
predictions — here as one jitted sharded eval graph with padded+masked
partial batches.
"""

from __future__ import annotations

import jax
import numpy as np

from audio_classification_icbhi_tpu.data.loader import BatchLoader
from audio_classification_icbhi_tpu.ops.mel import MelFrontend
from audio_classification_icbhi_tpu.parallel.data_parallel import make_step_fns
from audio_classification_icbhi_tpu.parallel.mesh import get_mesh
from audio_classification_icbhi_tpu.training.optimizers import build_optimizer


class Validator:
    def __init__(self, model, dataset, config, mesh=None, batch_size: int | None = None):
        from audio_classification_icbhi_tpu.utils.config import ensure_compile_cache

        ensure_compile_cache()
        self.model = model
        self.dataset = dataset
        self.config = config
        self.mesh = mesh if mesh is not None else get_mesh()
        self.batch_size = batch_size or config["training"]["batch_size"]
        n_dev = self.mesh.devices.size
        if self.batch_size % n_dev:
            # round batch up to a mesh multiple; padding+mask covers the rest
            self.batch_size = ((self.batch_size + n_dev - 1) // n_dev) * n_dev
        self.frontend = MelFrontend.from_config(config)
        # eval-only: optimizer is irrelevant but make_step_fns builds both
        self.steps = make_step_fns(
            model, self.frontend, build_optimizer("adam"), self.mesh
        )
        self.loader = BatchLoader(dataset, self.batch_size, shuffle=False)
        self.num_classes = config["model"]["num_classes"]

    def validate(self, params, batch_stats) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (y_true, y_pred, y_prob) over the whole dataset
        (reference validation.py:29-61). Multi-host safe: sharded inputs
        are assembled from per-process rows and state is replicated on the
        global mesh, like the Trainer's validation (logits return
        replicated from eval_step, so every host can fetch them)."""
        from audio_classification_icbhi_tpu.parallel.data_parallel import pad_eval_batch
        from audio_classification_icbhi_tpu.parallel.mesh import (
            replicate_multihost,
            shard_eval_batch_multihost,
        )

        ones = np.ones((self.num_classes,), np.float32)
        if jax.process_count() > 1:
            params = replicate_multihost(self.mesh, params)
            batch_stats = replicate_multihost(self.mesh, batch_stats)
            ones = replicate_multihost(self.mesh, ones)
        y_true, y_pred, y_prob = [], [], []
        for wavs, labels in self.loader:
            wavs, labels, mask, b = pad_eval_batch(wavs, labels, self.batch_size)
            g_wavs, g_labels, g_mask = shard_eval_batch_multihost(
                self.mesh, wavs, labels, mask
            )
            logits, _, _, _ = self.steps.eval_step(
                params, batch_stats, g_wavs, g_labels, g_mask, ones
            )
            probs = np.asarray(jax.nn.softmax(logits, axis=-1))[:b]
            y_prob.append(probs)
            y_pred.append(np.argmax(probs, axis=-1))
            y_true.append(labels[:b])
        return (
            np.concatenate(y_true).astype(np.int64),
            np.concatenate(y_pred).astype(np.int64),
            np.concatenate(y_prob),
        )
