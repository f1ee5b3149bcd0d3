"""Torch->flax weight conversion parity.

The LightweightCNN test builds the torch twin in torch.nn, converts its
weights, and checks FORWARD OUTPUT parity (eval mode) between torch and our
flax model — the strongest cross-framework check available without
torchvision in the image. The ResNet test validates structural completeness
against flax init shapes.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from audio_classification_icbhi_tpu.models import CompactResNet, LightweightCNN
from audio_classification_icbhi_tpu.models.torch_import import (
    convert_lightweight_cnn,
    convert_resnet18,
    load_torch_checkpoint,
)


class TorchConvBlock(nn.Module):
    """Torch twin of the reference ConvBlock (cnn.py:7-30) for parity testing."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.pool = nn.MaxPool2d(2)
        self.dropout = nn.Dropout2d(0.2)

    def forward(self, x):
        return self.dropout(self.pool(self.relu(self.bn(self.conv(x)))))


class TorchLightweightCNN(nn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        chans = [1, 32, 64, 128, 256, 256]
        for i in range(5):
            setattr(self, f"conv{i + 1}", TorchConvBlock(chans[i], chans[i + 1]))
        self.gap = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Linear(256, 128)
        self.dropout = nn.Dropout(0.3)
        self.fc2 = nn.Linear(128, num_classes)

    def forward(self, x):
        for i in range(5):
            x = getattr(self, f"conv{i + 1}")(x)
        x = torch.flatten(self.gap(x), 1)
        return self.fc2(self.dropout(torch.relu(self.fc1(x))))


class TestLightweightCNNImport:
    def test_forward_parity_with_torch(self, rng):
        tmodel = TorchLightweightCNN().eval()
        # randomize BN stats so the test exercises them
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 1.5)
        variables = convert_lightweight_cnn(tmodel.state_dict())

        x = rng.standard_normal((2, 1, 64, 96)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()

        fmodel = LightweightCNN(num_classes=4)
        got = np.asarray(
            fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        )
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_checkpoint_roundtrip_via_torch_save(self, tmp_path, rng):
        tmodel = TorchLightweightCNN().eval()
        ckpt = {"model_state_dict": tmodel.state_dict(), "epoch": 3}
        torch.save(ckpt, tmp_path / "ref.pt")
        sd = load_torch_checkpoint(str(tmp_path / "ref.pt"))
        variables = convert_lightweight_cnn(sd)
        assert variables["params"]["Dense_1"]["kernel"].shape == (128, 4)


class TestResNetImport:
    def _synthetic_state_dict(self, head: bool = True, in_ch: int = 1):
        """torchvision-resnet18-shaped state_dict with random values."""
        rng = np.random.default_rng(0)
        sd = {}

        def add_bn(name, c):
            sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
            sd[f"{name}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5

        sd["conv1.weight"] = rng.standard_normal((64, in_ch, 7, 7)).astype(np.float32)
        add_bn("bn1", 64)
        cin = 64
        for stage, cout in enumerate([64, 128, 256, 512], start=1):
            for block in range(2):
                t = f"layer{stage}.{block}"
                c_in = cin if block == 0 else cout
                stride_change = block == 0 and (cout != cin)
                sd[f"{t}.conv1.weight"] = rng.standard_normal((cout, c_in, 3, 3)).astype(np.float32)
                add_bn(f"{t}.bn1", cout)
                sd[f"{t}.conv2.weight"] = rng.standard_normal((cout, cout, 3, 3)).astype(np.float32)
                add_bn(f"{t}.bn2", cout)
                if stride_change:
                    sd[f"{t}.downsample.0.weight"] = rng.standard_normal(
                        (cout, c_in, 1, 1)
                    ).astype(np.float32)
                    add_bn(f"{t}.downsample.1", cout)
            cin = cout
        if head:
            sd["fc.1.weight"] = rng.standard_normal((256, 512)).astype(np.float32)
            sd["fc.1.bias"] = rng.standard_normal(256).astype(np.float32)
            sd["fc.4.weight"] = rng.standard_normal((4, 256)).astype(np.float32)
            sd["fc.4.bias"] = rng.standard_normal(4).astype(np.float32)
        return sd

    def test_structure_matches_flax_init(self):
        variables = convert_resnet18(self._synthetic_state_dict())
        model = CompactResNet(num_classes=4)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 1)), train=False)

        def shapes(tree):
            return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)

        assert shapes(variables["params"]) == shapes(ref["params"])
        assert shapes(variables["batch_stats"]) == shapes(ref["batch_stats"])
        # and the converted weights actually run
        out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.zeros((1, 64, 96, 1)), train=False,
        )
        assert out.shape == (1, 4)

    def test_imagenet_stem_folding(self):
        sd = self._synthetic_state_dict(head=False, in_ch=3)
        variables = convert_resnet18(sd, sum_rgb_stem=True)
        stem = variables["params"]["stem_conv"]["kernel"]
        assert stem.shape == (7, 7, 1, 64)
        want = sd["conv1.weight"].transpose(2, 3, 1, 0).sum(axis=2, keepdims=True)
        np.testing.assert_allclose(stem, want)

    def test_reference_prefix_stripped(self):
        sd = {f"resnet.{k}": v for k, v in self._synthetic_state_dict().items()}
        variables = convert_resnet18(sd)
        assert "stem_conv" in variables["params"]
