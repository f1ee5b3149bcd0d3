"""Config loading, seeding, and mesh/device selection.

TPU-native counterpart of reference src/utils/config.py:9-57: same YAML
schema (sections data/model/training/device/classes/seed, see
reference config.yaml), but `get_device` becomes `get_mesh` — device
placement on TPU is a jax.sharding.Mesh over however many chips exist,
not a single cuda/cpu pick.
"""

from __future__ import annotations

import copy
import random
from typing import Any

import jax
import numpy as np
import yaml

DEFAULT_CONFIG: dict[str, Any] = {
    "data": {
        "dataset_path": "data/ICBHI",
        "sample_rate": 16000,
        "n_mels": 128,
        "n_fft": 2048,
        "hop_length": 512,
        "duration": 8.0,
        "augmentation": True,
        "train_split": 0.7,
        "val_split": 0.15,
        "test_split": 0.15,
    },
    "model": {"architecture": "cnn", "num_classes": 4, "dropout": 0.3},
    "training": {
        "batch_size": 32,
        "epochs": 100,
        "learning_rate": 0.003,
        "weight_decay": 0.0001,
        "optimizer": "adam",
        "scheduler": "cosine",
        "mixed_precision": True,
        "gradient_accumulation_steps": 2,
        "early_stopping_patience": 15,
        "checkpoint_dir": "checkpoints",
        "log_dir": "runs",
        "save_every": 5,
    },
    "device": {"use_cuda": True, "num_workers": 4, "pin_memory": True},
    "classes": ["normal", "crackles", "wheezes", "both"],
    "seed": 42,
}


def _deep_update(base: dict, overrides: dict) -> dict:
    out = dict(base)
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_update(out[k], v)
        else:
            out[k] = v
    return out


def load_config(config_path: str | None = None) -> dict[str, Any]:
    """Load a YAML config (reference src/utils/config.py:9-21), merged over
    defaults so partial configs are valid.

    The result is a DEEP copy: callers mutate configs in place (train.py
    applies argparse overrides like config['model']['architecture'] = ...),
    and a shallow merge would alias un-overridden sections to the
    module-global DEFAULT_CONFIG — corrupting the defaults every later
    load_config() in the process returns.
    """
    if config_path is None:
        return copy.deepcopy(DEFAULT_CONFIG)
    with open(config_path, "r") as f:
        user = yaml.safe_load(f) or {}
    return _deep_update(copy.deepcopy(DEFAULT_CONFIG), user)


def ensure_compile_cache(path: str = "/tmp/jax_persistent_cache") -> None:
    """Enable XLA's persistent compilation cache if the user hasn't already.

    This host has one CPU core and the TPU sits behind a tunnel: cold
    compiles cost 15-130 s per graph (measured; model init alone was 65 s).
    The persistent cache makes every repeat run near-instant. No-op when a
    cache dir is already configured or the backend predates the knob.
    """
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def set_seed(seed: int = 42) -> jax.Array:
    """Seed python/numpy RNGs and return the root jax PRNG key.

    The reference seeds torch + cudnn globally (src/utils/config.py:24-37);
    in JAX determinism is structural — all on-device randomness flows from
    the returned key.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def describe_devices() -> str:
    devs = jax.devices()
    return f"{len(devs)}x {devs[0].platform}:{getattr(devs[0], 'device_kind', '?')}"
