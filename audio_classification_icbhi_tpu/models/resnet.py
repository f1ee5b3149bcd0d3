"""CompactResNet18 in flax.linen (TPU-native, NHWC, built from scratch).

Capability match for the reference's torchvision-based CompactResNet
(reference: src/models/resnet.py:8-57): ResNet18 topology
(BasicBlock x [2,2,2,2], channels 64/128/256/512), single-channel 7x7/2 stem
(reference resnet.py:29), and a 2-layer head
Dropout(p) -> Dense(512->256) -> ReLU -> Dropout(p/2) -> Dense(256->classes)
(reference resnet.py:32-39). ~11.3M trainable params.

Unlike the reference, no torchvision dependency: the blocks are hand-written
flax modules in NHWC with optional cross-replica BatchNorm (axis_name) and a
bf16 compute dtype for the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from audio_classification_icbhi_tpu.models.cnn import conv_init, dense_init


class BasicBlock(nn.Module):
    """Standard ResNet-v1 basic block: two 3x3 convs + identity/projection skip."""

    features: int
    strides: int = 1
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                name=name,
            )

        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="conv1",
        )(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1,
            use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="conv2",
        )(y)
        y = bn("bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides,
                use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class CompactResNet(nn.Module):
    """ResNet18 with 1-channel stem + 2-layer dropout head
    (parity: reference resnet.py:19-39).

    Input: (B, n_mels, T, 1). Output: (B, num_classes) f32 logits.
    """

    num_classes: int = 4
    dropout: float = 0.3
    axis_name: str | None = None
    dtype: Any = jnp.float32
    stage_sizes: tuple = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=2, padding=3,
            use_bias=False, kernel_init=conv_init, dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, dtype=self.dtype, name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(
                    features, strides=strides, axis_name=self.axis_name,
                    dtype=self.dtype, name=f"layer{stage + 1}_block{block}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 512)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(256, kernel_init=dense_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout / 2, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=dense_init, dtype=self.dtype)(x)
        return x.astype(jnp.float32)
