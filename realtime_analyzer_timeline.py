#!/usr/bin/env python
"""Timeline analyzer: colored-block detection timeline.

Contract matches reference realtime_analyzer_timeline.py:487-547: threshold
flags, {stem}_timeline.png + {stem}_detections.csv (with Detection Type
column, :449-484), colored blocks normal/wheeze/crackle/both (:264-269).
"""

import argparse
from pathlib import Path

from audio_classification_icbhi_tpu.analyzers import AnalyzerEngine, viz


class TimelineAudioAnalyzer(AnalyzerEngine):
    def __init__(self, model_path, segment_duration=1.0, overlap=0.5,
                 sample_rate=16000, device=None,
                 crackle_threshold=0.3, wheeze_threshold=0.3):
        super().__init__(
            model_path, segment_duration=segment_duration, overlap=overlap,
            sample_rate=sample_rate, mode="threshold",
            crackle_threshold=crackle_threshold, wheeze_threshold=wheeze_threshold,
        )

    def visualize_timeline(self, results, audio, save_path=None, show=True):
        viz.timeline(results, audio, self.sample_rate, save_path=save_path, show=show)

    def export_results(self, results, output_path):
        self.export_results_timeline(results, output_path)


def main():
    parser = argparse.ArgumentParser(
        description="Respiratory sound analyzer with linear timeline visualization"
    )
    parser.add_argument("--audio", type=str, required=True, help="Path to audio file")
    parser.add_argument("--model", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--segment-duration", type=float, default=1.0)
    parser.add_argument("--overlap", type=float, default=0.5)
    parser.add_argument("--crackle-threshold", type=float, default=0.3)
    parser.add_argument("--wheeze-threshold", type=float, default=0.3)
    parser.add_argument("--output-dir", type=str, default="analysis_results")
    parser.add_argument("--device", type=str, choices=["cuda", "cpu", "tpu"], default="tpu")
    parser.add_argument("--no-display", action="store_true", help="Don't show plot")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(exist_ok=True)

    analyzer = TimelineAudioAnalyzer(
        model_path=args.model,
        segment_duration=args.segment_duration,
        overlap=args.overlap,
        crackle_threshold=args.crackle_threshold,
        wheeze_threshold=args.wheeze_threshold,
    )
    results, audio = analyzer.analyze_audio(args.audio)
    analyzer.print_summary(results)

    audio_name = Path(args.audio).stem
    analyzer.visualize_timeline(
        results, audio,
        save_path=str(output_dir / f"{audio_name}_timeline.png"),
        show=not args.no_display,
    )
    analyzer.export_results(results, str(output_dir / f"{audio_name}_detections.csv"))
    print(f"\n✓ Results saved to: {output_dir}")


if __name__ == "__main__":
    main()
