"""Model tests: shapes, param-count parity with the reference, init laws,
train/eval mode behavior (reference smoke blocks: src/models/cnn.py:111-118,
src/models/resnet.py:65-72)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_icbhi_tpu.models import (
    CompactResNet,
    LightweightCNN,
    build_model,
    count_parameters,
)


def init_model(model, shape=(2, 128, 94, 1), seed=0):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    return variables, x


class TestLightweightCNN:
    def test_forward_shape(self):
        model = LightweightCNN(num_classes=4)
        variables, _ = init_model(model)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 128, 313, 1)), jnp.float32)
        out = model.apply(variables, x, train=False)
        assert out.shape == (8, 4)
        assert out.dtype == jnp.float32

    def test_param_count_parity(self):
        """Reference LightweightCNN has 1,012,068 trainable params
        (conv 977,184 + BN 1,472 + FC 33,412; derived from cnn.py:44-60)."""
        model = LightweightCNN(num_classes=4)
        variables, _ = init_model(model)
        assert count_parameters(variables["params"]) == 1_012_068

    def test_train_mode_needs_dropout_rng_and_updates_bn(self):
        model = LightweightCNN(num_classes=4)
        variables, _ = init_model(model)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 128, 94, 1)), jnp.float32
        )
        out, mutated = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 4)
        # batch stats must move away from init (mean 0 var 1) after one step
        leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
        assert not np.allclose(np.asarray(leaf), 0.0)

    def test_eval_deterministic(self):
        model = LightweightCNN(num_classes=4)
        variables, x = init_model(model)
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_compute_f32_logits(self):
        model = LightweightCNN(num_classes=4, dtype=jnp.bfloat16)
        variables, x = init_model(model)
        out = model.apply(variables, x, train=False)
        assert out.dtype == jnp.float32
        # params stay f32
        p = jax.tree_util.tree_leaves(variables["params"])[0]
        assert p.dtype == jnp.float32

    def test_conv_init_he_fan_out(self):
        model = LightweightCNN(num_classes=4)
        variables, _ = init_model(model, seed=3)
        # STEM conv (ConvBlock_0, flax 0-based): kernel (3,3,1,32),
        # fan_out = 3*3*32 = 288 -> std ~ sqrt(2/288). The stem is the block
        # most likely to deviate (fan_in 1); check a deeper block too.
        for block, in_ch, out_ch in (("ConvBlock_0", 1, 32), ("ConvBlock_1", 32, 64)):
            k = variables["params"][block]["Conv_0"]["kernel"]
            assert k.shape == (3, 3, in_ch, out_ch)
            fan_out = k.shape[0] * k.shape[1] * k.shape[3]
            expected = np.sqrt(2.0 / fan_out)
            assert abs(float(jnp.std(k)) - expected) / expected < 0.25, block


class TestCompactResNet:
    def test_forward_shape(self):
        model = CompactResNet(num_classes=4)
        variables, _ = init_model(model)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 128, 313, 1)), jnp.float32)
        out = model.apply(variables, x, train=False)
        assert out.shape == (4, 4)

    def test_param_count_parity(self):
        """Reference CompactResNet = torchvision resnet18 (11,689,512) minus
        fc (513,000) minus 3->1 stem channels (6,272) plus the 2-layer head
        (132,356) = 11,302,596 (derived from resnet.py:19-39)."""
        model = CompactResNet(num_classes=4)
        variables, _ = init_model(model)
        assert count_parameters(variables["params"]) == 11_302_596

    def test_train_step_mutates_stats(self):
        model = CompactResNet(num_classes=4)
        variables, x = init_model(model)
        out, mutated = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 4)
        # stats must actually MOVE from init (flax returns the collection
        # whether or not values updated, so key-presence alone is vacuous)
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(variables["batch_stats"]),
                jax.tree_util.tree_leaves(mutated["batch_stats"]),
            )
        )
        assert moved


class TestRegistry:
    @pytest.mark.parametrize("arch,cls", [("cnn", LightweightCNN), ("resnet", CompactResNet)])
    def test_build_model(self, arch, cls):
        config = {
            "model": {"architecture": arch, "num_classes": 4, "dropout": 0.3},
            "training": {"mixed_precision": True},
        }
        model = build_model(config)
        assert isinstance(model, cls)
        assert model.dtype == jnp.bfloat16

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="Unknown model"):
            build_model({"model": {"architecture": "vit", "num_classes": 4, "dropout": 0.1}})
