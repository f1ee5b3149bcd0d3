"""Convert torch state_dicts from the reference models into flax variables.

Lets users of the reference bring their trained weights across:
- LightweightCNN (reference src/models/cnn.py:33-103)
- CompactResNet = torchvision resnet18 with 1-channel stem + 2-layer head
  (reference src/models/resnet.py:19-39); also accepts a plain torchvision
  resnet18 state_dict for the ImageNet-pretrained path (resnet.py:23-26) —
  the stem conv is channel-summed 3->1 and the fc head is dropped.

Tensors may be torch.Tensor or numpy. Conv kernels transpose
(O, I, H, W) -> (H, W, I, O); Linear kernels transpose (out, in) -> (in, out);
BatchNorm weight/bias/running_mean/running_var map to
scale/bias + batch_stats mean/var.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _linear(t) -> np.ndarray:
    return _np(t).T  # (out, in) -> (in, out)


def _strip_prefix(state_dict: dict, prefix: str) -> dict:
    if any(k.startswith(prefix) for k in state_dict):
        return {k[len(prefix):] if k.startswith(prefix) else k: v
                for k, v in state_dict.items()}
    return state_dict


def _bn(sd: dict, name: str) -> tuple[dict, dict]:
    params = {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}
    stats = {"mean": _np(sd[f"{name}.running_mean"]), "var": _np(sd[f"{name}.running_var"])}
    return params, stats


def convert_lightweight_cnn(state_dict: dict) -> dict:
    """torch LightweightCNN state_dict -> flax variables dict."""
    sd = dict(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    for i in range(5):
        tname = f"conv{i + 1}"
        fname = f"ConvBlock_{i}"
        bn_p, bn_s = _bn(sd, f"{tname}.bn")
        params[fname] = {
            "Conv_0": {"kernel": _conv(sd[f"{tname}.conv.weight"])},
            "BatchNorm_0": bn_p,
        }
        batch_stats[fname] = {"BatchNorm_0": bn_s}
    params["Dense_0"] = {"kernel": _linear(sd["fc1.weight"]), "bias": _np(sd["fc1.bias"])}
    params["Dense_1"] = {"kernel": _linear(sd["fc2.weight"]), "bias": _np(sd["fc2.bias"])}
    return {"params": params, "batch_stats": batch_stats}


def convert_resnet18(state_dict: dict, *, sum_rgb_stem: bool = False) -> dict:
    """torch CompactResNet / torchvision resnet18 state_dict -> flax variables.

    sum_rgb_stem=True accepts an ImageNet 3-channel stem and folds it to the
    1-channel stem by summing input channels (equivalent response on
    gray-replicated input).
    """
    sd = _strip_prefix(dict(state_dict), "resnet.")
    params: dict = {}
    batch_stats: dict = {}

    stem = _conv(sd["conv1.weight"])  # (7, 7, C, 64)
    if stem.shape[2] == 3 and sum_rgb_stem:
        stem = stem.sum(axis=2, keepdims=True)
    params["stem_conv"] = {"kernel": stem}
    bn_p, bn_s = _bn(sd, "bn1")
    params["stem_bn"] = bn_p
    batch_stats["stem_bn"] = bn_s

    for stage in range(1, 5):
        for block in range(2):
            t = f"layer{stage}.{block}"
            f = f"layer{stage}_block{block}"
            p: dict = {
                "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"])},
            }
            s: dict = {}
            p["bn1"], s["bn1"] = _bn(sd, f"{t}.bn1")
            p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = p
            batch_stats[f] = s

    # head: reference fc = Sequential(Dropout, Linear, ReLU, Dropout, Linear)
    if "fc.1.weight" in sd:
        params["Dense_0"] = {"kernel": _linear(sd["fc.1.weight"]), "bias": _np(sd["fc.1.bias"])}
        params["Dense_1"] = {"kernel": _linear(sd["fc.4.weight"]), "bias": _np(sd["fc.4.bias"])}
    # a plain torchvision fc (fc.weight) is intentionally dropped: the
    # reference replaces it with its own head (resnet.py:32-39)
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Read a torch .pt checkpoint (reference save format, trainer_fixed.py
    :314-324) and return its model state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    return ckpt
