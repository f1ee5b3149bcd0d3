"""Model registry.

Replaces the reference's if/else on config['model']['architecture'] repeated
in every entry point (reference: train.py:85-94, cli.py:25-34,
realtime_analyzer.py:100-110) with a single registry.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def build_model(config: dict[str, Any], *, axis_name: str | None = None, dtype=None):
    """Build a model module from a config dict (same schema as reference
    config.yaml model section: architecture/num_classes/dropout)."""
    arch = config["model"]["architecture"].lower()
    if arch not in _REGISTRY:
        raise ValueError(f"Unknown model architecture: {arch!r} (have {available_models()})")
    if dtype is None:
        tcfg = config.get("training", {})
        precision = tcfg.get("precision")
        if precision is None:
            precision = "bf16" if tcfg.get("mixed_precision", False) else "fp32"
        dtype = {
            "bf16": jnp.bfloat16,
            "fp16": jnp.float16,  # pairs with the trainer's GradScaler mode
            "fp32": jnp.float32,
        }[precision]
    return _REGISTRY[arch](
        num_classes=config["model"]["num_classes"],
        dropout=config["model"]["dropout"],
        axis_name=axis_name,
        dtype=dtype,
    )


def init_variables(model, key, input_shape, dtype=None):
    """model.init as ONE jitted program on the default (compute) device.

    Eager init dispatches hundreds of tiny ops — 30-50 ms RPC each through
    a tunneled TPU backend, and a fresh XLA compile each on a 1-core CPU
    host (~65 s measured). One jitted program is a single compile, lands
    the parameters where training runs, and hits the persistent
    compilation cache (utils.config.ensure_compile_cache) on repeat runs."""
    import jax

    dummy = jnp.zeros(input_shape, dtype or jnp.float32)
    return jax.jit(lambda k: model.init(k, dummy, train=False))(key)


def _register_builtins():
    from audio_classification_icbhi_tpu.models.cnn import LightweightCNN
    from audio_classification_icbhi_tpu.models.resnet import CompactResNet

    _REGISTRY.setdefault("cnn", LightweightCNN)
    _REGISTRY.setdefault("resnet", CompactResNet)


_register_builtins()
