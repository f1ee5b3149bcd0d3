"""Optimizers with torch-parity semantics (reference trainer_fixed.py:56-75).

The returned transformation is LR-LESS: it produces the update direction
(moments + weight-decay placement), and the train step multiplies by the
scheduler's per-epoch learning rate. Weight-decay placement matters for
parity:

- torch Adam / SGD: wd is classic L2 — added to the gradient BEFORE the
  moment updates -> add_decayed_weights first.
- torch AdamW: decoupled — decay added to the update AFTER the moments
  -> add_decayed_weights after scale_by_adam.
"""

from __future__ import annotations

import optax


def build_optimizer(name: str, weight_decay: float = 0.0) -> optax.GradientTransformation:
    name = (name or "adam").lower()
    if name == "adam":
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam())
        return optax.chain(*chain)
    if name == "adamw":
        chain = [optax.scale_by_adam()]
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        return optax.chain(*chain)
    # SGD with momentum 0.9 (reference trainer_fixed.py:70-75)
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.trace(decay=0.9, nesterov=False))
    return optax.chain(*chain)
