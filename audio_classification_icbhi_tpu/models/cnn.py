"""LightweightCNN classifier in flax.linen (TPU-native, NHWC).

Capability match for the reference's ~1.0M-param 5-block CNN
(reference: src/models/cnn.py:7-103): Conv3x3(no bias)->BN->ReLU->MaxPool2->
ChannelDropout(0.2) with channels 1->32->64->128->256->256, global average
pool, FC 256->128->num_classes with dropout, He fan_out init for convs and
N(0, 0.01) for dense layers (reference cnn.py:64-74).

TPU-first choices: NHWC layout (XLA's preferred conv layout on TPU — inputs
are (B, n_mels, T, 1)), BatchNorm with optional `axis_name` so batch stats
sync across the data-parallel mesh with a psum instead of the reference's
single-device stats, and channel dropout expressed as a broadcast dropout
(one mask per channel) so it fuses into the surrounding elementwise ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_normal_ is an untruncated normal; use normal for exact-law parity.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
dense_init = nn.initializers.normal(stddev=0.01)


class ConvBlock(nn.Module):
    """Conv3x3 (no bias) -> BatchNorm -> ReLU -> MaxPool2 -> channel dropout.

    Mirrors reference ConvBlock (src/models/cnn.py:7-30).
    """

    features: int
    kernel_size: int = 3
    pool_size: int = 2
    drop_rate: float = 0.2
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (self.pool_size, self.pool_size), strides=(self.pool_size, self.pool_size))
        # Dropout2d: one mask per (sample, channel), broadcast over H, W.
        x = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2), deterministic=not train)(x)
        return x


class LightweightCNN(nn.Module):
    """5-block CNN, ~1.01M trainable params (parity: reference cnn.py:44-60).

    Input: (B, n_mels, T, 1) float. Output: (B, num_classes) float32 logits.
    `dtype=jnp.bfloat16` runs conv/matmul compute in bf16 on the MXU while
    keeping params and logits in f32 (the reference's AMP analog).
    """

    num_classes: int = 4
    dropout: float = 0.3
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for features in (32, 64, 128, 256, 256):
            x = ConvBlock(features, axis_name=self.axis_name, dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 256)
        x = nn.Dense(128, kernel_init=dense_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=dense_init, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def count_parameters(params) -> int:
    """Trainable parameter count (reference cnn.py:106-108)."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
