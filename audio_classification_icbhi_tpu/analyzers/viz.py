"""Analyzer visualizations: 3-panel, colored timeline, spectrogram overlay.

Presentation parity with the reference family:
- three_panel: waveform / detection vlines + threshold lines / confidence
  timeline (realtime_analyzer_parallel.py:259-342)
- timeline: waveform + colored blocks (normal gray, wheeze green #22C55E,
  crackle purple #9333EA, both red #EF4444) + stats box
  (realtime_analyzer_timeline.py:242-402)
- spectrogram: timeline view + full-recording mel panel in the LIBROSA
  convention (slaney mels, power_to_db ref=max) with detection overlays
  (realtime_analyzer_spec.py:290-343) — computed on-device by our ops
  instead of librosa.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import Patch, Rectangle

from audio_classification_icbhi_tpu.ops import mel as mel_ops

COLORS = {
    "normal": "#F5F5F5",
    "wheeze": "#22C55E",
    "crackle": "#9333EA",
    "both": "#EF4444",
}


def _detection_label(r) -> str:
    if r.has_crackle and r.has_wheeze:
        return "both"
    if r.has_crackle:
        return "crackle"
    if r.has_wheeze:
        return "wheeze"
    return "normal"


def _finish(fig, save_path, show):
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight", facecolor="white")
        print(f"\n✓ Visualization saved to: {save_path}")
    if show:
        plt.show()
    plt.close(fig)


def _plot_waveform(ax, audio, sample_rate, title="Audio Waveform"):
    duration = len(audio) / sample_rate
    t = np.linspace(0, duration, len(audio))
    ax.plot(t, audio, color="gray", linewidth=0.5, alpha=0.7)
    ax.set_ylabel("Amplitude", fontsize=12)
    ax.set_title(title, fontsize=14, fontweight="bold")
    ax.grid(True, alpha=0.3)
    ax.set_xlim([0, duration])
    return duration


def three_panel(
    results, audio, sample_rate,
    crackle_threshold=None, wheeze_threshold=None,
    save_path=None, show=False,
):
    fig, axes = plt.subplots(3, 1, figsize=(16, 10))
    duration = _plot_waveform(axes[0], audio, sample_rate)

    ax2 = axes[1]
    seen = set()  # label the first DRAWN artist of each kind, not index 0
    for r in results:
        mid = (r.start_time + r.end_time) / 2
        if r.has_crackle:
            ax2.vlines(mid, 0, min(r.crackle_confidence, 1.0), colors="purple",
                       linewidth=4, alpha=0.7,
                       label="" if "c" in seen else "Crackle")
            seen.add("c")
        if r.has_wheeze:
            ax2.vlines(mid, 0, min(r.wheeze_confidence, 1.0), colors="green",
                       linewidth=4, alpha=0.7,
                       label="" if "w" in seen else "Wheeze")
            seen.add("w")
    if crackle_threshold is not None:
        ax2.axhline(y=crackle_threshold, color="purple", linestyle="--", linewidth=2,
                    alpha=0.5, label=f"Crackle Threshold ({crackle_threshold:.2f})")
    if wheeze_threshold is not None:
        ax2.axhline(y=wheeze_threshold, color="green", linestyle="--", linewidth=2,
                    alpha=0.5, label=f"Wheeze Threshold ({wheeze_threshold:.2f})")
    ax2.set_ylabel("Confidence", fontsize=12)
    ax2.set_title("Respiratory Sound Detection (Purple=Crackles, Green=Wheezes)",
                  fontsize=14, fontweight="bold")
    ax2.set_ylim([0, 1.0])
    ax2.set_xlim([0, duration])
    ax2.grid(True, alpha=0.3)
    if ax2.get_legend_handles_labels()[1]:  # no detections -> no legend spam
        ax2.legend(loc="upper right", fontsize=9)

    ax3 = axes[2]
    times = [(r.start_time + r.end_time) / 2 for r in results]
    cc = [min(r.crackle_confidence, 1.0) for r in results]
    wc = [min(r.wheeze_confidence, 1.0) for r in results]
    ax3.plot(times, cc, color="purple", linewidth=2, marker="o", markersize=5,
             label="Crackles", alpha=0.8)
    ax3.plot(times, wc, color="green", linewidth=2, marker="o", markersize=5,
             label="Wheezes", alpha=0.8)
    ax3.fill_between(times, cc, alpha=0.2, color="purple")
    ax3.fill_between(times, wc, alpha=0.2, color="green")
    if crackle_threshold is not None:
        ax3.axhline(y=crackle_threshold, color="purple", linestyle="--", linewidth=1, alpha=0.5)
    if wheeze_threshold is not None:
        ax3.axhline(y=wheeze_threshold, color="green", linestyle="--", linewidth=1, alpha=0.5)
    ax3.set_xlabel("Time (seconds)", fontsize=12)
    ax3.set_ylabel("Confidence", fontsize=12)
    ax3.set_title("Confidence Timeline", fontsize=14, fontweight="bold")
    ax3.set_ylim([0, 1.0])
    ax3.set_xlim([0, duration])
    ax3.grid(True, alpha=0.3)
    ax3.legend(loc="upper right", fontsize=10)
    fig.tight_layout()
    _finish(fig, save_path, show)


def _draw_timeline_axis(ax, results, duration):
    ax.set_xlim([0, duration])
    ax.set_ylim([0, 1])
    for r in results:
        label = _detection_label(r)
        ax.add_patch(
            Rectangle(
                (r.start_time, 0), r.end_time - r.start_time, 1,
                facecolor=COLORS[label], edgecolor="#1E293B", linewidth=1.5, alpha=0.9,
            )
        )
    ax.set_xlabel("Time (seconds)", fontsize=12, fontweight="bold")
    ax.set_yticks([])
    ax.set_title("Respiratory Sound Detection Timeline", fontsize=14, fontweight="bold", pad=15)
    ax.grid(True, axis="x", alpha=0.3, linestyle="--", linewidth=0.8)
    legend = [
        Patch(facecolor=COLORS[k], edgecolor="#1E293B", label=k.capitalize(), linewidth=1.5)
        for k in ("normal", "wheeze", "crackle", "both")
    ]
    ax.legend(handles=legend, loc="upper right", fontsize=11, framealpha=0.95,
              edgecolor="#1E293B", title="Detection Type", title_fontsize=11)
    total = max(len(results), 1)
    crackle = sum(1 for r in results if r.has_crackle and not r.has_wheeze)
    wheeze = sum(1 for r in results if r.has_wheeze and not r.has_crackle)
    both = sum(1 for r in results if r.has_crackle and r.has_wheeze)
    normal = sum(1 for r in results if not r.has_crackle and not r.has_wheeze)
    stats = (
        f"Summary: {len(results)} segments\n"
        f"Normal: {normal} ({100 * normal / total:.0f}%) | "
        f"Wheeze: {wheeze} ({100 * wheeze / total:.0f}%) | "
        f"Crackle: {crackle} ({100 * crackle / total:.0f}%) | "
        f"Both: {both} ({100 * both / total:.0f}%)"
    )
    ax.text(0.02, 0.98, stats, transform=ax.transAxes, fontsize=10,
            verticalalignment="top", family="monospace",
            bbox=dict(boxstyle="round", facecolor="white", alpha=0.9, edgecolor="#1E293B"))


def timeline(results, audio, sample_rate, save_path=None, show=False):
    fig, axes = plt.subplots(
        2, 1, figsize=(18, 8), gridspec_kw={"height_ratios": [1, 2]}
    )
    duration = _plot_waveform(axes[0], audio, sample_rate)
    axes[0].set_xticklabels([])
    _draw_timeline_axis(axes[1], results, duration)
    fig.tight_layout()
    _finish(fig, save_path, show)


def spectrogram(results, audio, sample_rate, save_path=None, show=False,
                n_fft=2048, hop_length=512, n_mels=128):
    """Timeline + full-recording mel panel. The mel uses the LIBROSA
    convention the reference's spec analyzer used (slaney scale+norm,
    power_to_db ref=max; realtime_analyzer_spec.py:295-305), computed by our
    on-device ops."""
    import jax.numpy as jnp

    fig, axes = plt.subplots(
        3, 1, figsize=(18, 12), gridspec_kw={"height_ratios": [1, 1.4, 1]}
    )
    duration = _plot_waveform(axes[0], audio, sample_rate)
    axes[0].set_xticklabels([])

    mel_db = np.asarray(
        mel_ops.log_mel_spectrogram(
            jnp.asarray(audio.astype(np.float32)), sample_rate, n_fft, hop_length,
            n_mels, mel_scale="slaney", norm="slaney", to_db="power_max",
        )
    )
    ax_spec = axes[1]
    img = ax_spec.imshow(
        mel_db, aspect="auto", origin="lower", cmap="viridis",
        extent=[0, duration, 0, sample_rate / 2],
    )
    fig.colorbar(img, ax=ax_spec, format="%+2.0f dB").set_label(
        "Intensity (dB)", fontsize=10, fontweight="bold"
    )
    ax_spec.set_ylabel("Frequency (Hz, mel-spaced)", fontsize=11)
    ax_spec.set_title("Mel Spectrogram with Detections", fontsize=13, fontweight="bold")
    for r in results:
        label = _detection_label(r)
        if label == "normal":
            continue
        ax_spec.axvspan(r.start_time, r.end_time, color=COLORS[label], alpha=0.3, zorder=10)

    _draw_timeline_axis(axes[2], results, duration)
    fig.tight_layout()
    _finish(fig, save_path, show)
