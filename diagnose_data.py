#!/usr/bin/env python
"""Dataset diagnostics: load check, class balance, NaN/Inf scan, sample
visualization, one batch + forward + loss sanity
(reference diagnose_data.py:11-131)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_icbhi_tpu.data.dataset import ICBHIDataset
from audio_classification_icbhi_tpu.data.dataset_segmented import ICBHISegmentedDataset
from audio_classification_icbhi_tpu.data.loader import BatchLoader
from audio_classification_icbhi_tpu.models import build_model
from audio_classification_icbhi_tpu.ops.mel import MelFrontend
from audio_classification_icbhi_tpu.parallel.data_parallel import (
    features_from_wavs,
    weighted_cross_entropy,
)
from audio_classification_icbhi_tpu.utils.config import load_config, set_seed


def diagnose_dataset(config_path: str, segmented: bool = False, num_viz: int = 6):
    config = load_config(config_path)
    set_seed(config.get("seed", 42))
    cls = ICBHISegmentedDataset if segmented else ICBHIDataset
    dataset = cls(config["data"]["dataset_path"], "train", config, augment=False)

    print(f"\nDataset size: {len(dataset)}")
    labels = dataset.labels
    counts = np.bincount(labels, minlength=config["model"]["num_classes"])
    print("Class distribution:")
    for i, c in enumerate(counts):
        print(f"  {config['classes'][i]}: {c}")
    nonzero = counts[counts > 0]
    if len(nonzero) and nonzero.max() > 5 * max(nonzero.min(), 1):
        print("WARNING: severe class imbalance (>5x) detected")  # reference :47-49

    dcfg = config["data"]
    frontend = MelFrontend(
        sample_rate=dcfg["sample_rate"], n_mels=dcfg["n_mels"], n_fft=dcfg["n_fft"],
        hop_length=dcfg["hop_length"], duration=dcfg["duration"],
    )

    # per-sample stats + NaN/Inf scan (reference :52-66)
    print("\nSample statistics:")
    for i in range(min(num_viz, len(dataset))):
        wav, label = dataset[i]
        mel = np.asarray(frontend(jnp.asarray(wav[None])))[0]
        flags = ""
        if not np.isfinite(mel).all():
            flags = "  <-- NaN/Inf DETECTED"
        print(
            f"  [{i}] label={config['classes'][label]:<9} mel "
            f"mean={mel.mean():+.3f} std={mel.std():.3f} "
            f"min={mel.min():+.2f} max={mel.max():+.2f}{flags}"
        )

    # sample visualization (reference :69-90)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(num_viz, len(dataset))
    fig, axes = plt.subplots(2, (n + 1) // 2, figsize=(4 * ((n + 1) // 2), 6))
    for i, ax in enumerate(np.ravel(axes)[:n]):
        wav, label = dataset[i]
        mel = np.asarray(frontend(jnp.asarray(wav[None])))[0]
        ax.imshow(mel, aspect="auto", origin="lower", cmap="magma")
        ax.set_title(config["classes"][label])
    fig.tight_layout()
    fig.savefig("data_samples.png", dpi=120)
    plt.close(fig)
    print("\nSample visualization saved to data_samples.png")

    # one batch + model forward + loss sanity (reference :93-123)
    loader = BatchLoader(dataset, batch_size=min(8, len(dataset)), shuffle=False)
    wavs, labels = next(iter(loader))
    print(f"\nBatch shapes: wavs={wavs.shape} labels={labels.shape}")
    model = build_model(config)
    feats = features_from_wavs(frontend, jnp.asarray(wavs))
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    logits = model.apply(variables, feats, train=False)
    ones = jnp.ones(config["model"]["num_classes"], jnp.float32)
    num, den = weighted_cross_entropy(
        logits, jnp.asarray(labels), ones, jnp.ones(len(labels), jnp.float32)
    )
    loss = float(num) / float(den)
    print(f"Forward OK: logits={logits.shape}, initial loss={loss:.4f}")
    expected = float(np.log(config["model"]["num_classes"]))
    if abs(loss - expected) > 1.0:
        print(f"WARNING: initial loss far from ln(C)={expected:.3f}")
    else:
        print(f"Initial loss near ln(C)={expected:.3f} — sane")
    print("\n✓ Diagnostics complete")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Diagnose dataset health")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--segmented", action="store_true")
    args = parser.parse_args()
    diagnose_dataset(args.config, segmented=args.segmented)
