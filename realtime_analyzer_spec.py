#!/usr/bin/env python
"""Spectrogram analyzer: timeline + full-recording mel panel with detection
overlays.

Contract matches reference realtime_analyzer_spec.py:524-577: threshold
flags, {stem}_spectrogram.png + {stem}_detections.csv. The mel panel uses
the librosa convention the reference used (slaney mels, power_to_db
ref=max; :295-305), computed on-device by our ops instead of librosa.
"""

import argparse
from pathlib import Path

from audio_classification_icbhi_tpu.analyzers import AnalyzerEngine, viz


class SpectrogramAudioAnalyzer(AnalyzerEngine):
    def __init__(self, model_path, segment_duration=1.0, overlap=0.5,
                 sample_rate=16000, device=None,
                 crackle_threshold=0.3, wheeze_threshold=0.3):
        super().__init__(
            model_path, segment_duration=segment_duration, overlap=overlap,
            sample_rate=sample_rate, mode="threshold",
            crackle_threshold=crackle_threshold, wheeze_threshold=wheeze_threshold,
        )

    def visualize_spectrogram(self, results, audio, save_path=None, show=True):
        viz.spectrogram(results, audio, self.sample_rate, save_path=save_path, show=show)

    def export_results(self, results, output_path):
        self.export_results_timeline(results, output_path)


def main():
    parser = argparse.ArgumentParser(
        description="Respiratory sound analyzer with spectrogram visualization"
    )
    parser.add_argument("--audio", type=str, required=True, help="Path to audio file")
    parser.add_argument("--model", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--segment-duration", type=float, default=1.0)
    parser.add_argument("--overlap", type=float, default=0.5)
    parser.add_argument("--crackle-threshold", type=float, default=0.3)
    parser.add_argument("--wheeze-threshold", type=float, default=0.3)
    parser.add_argument("--output-dir", type=str, default="analysis_results")
    parser.add_argument("--device", type=str, choices=["cuda", "cpu", "tpu"], default="tpu")
    parser.add_argument("--no-display", action="store_true")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(exist_ok=True)

    analyzer = SpectrogramAudioAnalyzer(
        model_path=args.model,
        segment_duration=args.segment_duration,
        overlap=args.overlap,
        crackle_threshold=args.crackle_threshold,
        wheeze_threshold=args.wheeze_threshold,
    )
    results, audio = analyzer.analyze_audio(args.audio)
    analyzer.print_summary(results)

    audio_name = Path(args.audio).stem
    analyzer.visualize_spectrogram(
        results, audio,
        save_path=str(output_dir / f"{audio_name}_spectrogram.png"),
        show=not args.no_display,
    )
    analyzer.export_results(results, str(output_dir / f"{audio_name}_detections.csv"))
    print(f"\n✓ Results saved to: {output_dir}")


if __name__ == "__main__":
    main()
