#!/usr/bin/env python
"""Threshold-configurable batched analyzer.

Contract matches reference realtime_analyzer_parallel.py:388-439: flags
--crackle-threshold/--wheeze-threshold (default 0.3), clamped confidence
sums (:217-222), and _analysis_t{thr:.2f}.png / _results_t{thr:.2f}.csv
output names.
"""

import argparse
from pathlib import Path

from audio_classification_icbhi_tpu.analyzers import AnalyzerEngine, viz


class ConfigurableAudioAnalyzer(AnalyzerEngine):
    def __init__(self, model_path, segment_duration=1.0, overlap=0.5,
                 sample_rate=16000, device=None,
                 crackle_threshold=0.3, wheeze_threshold=0.3):
        super().__init__(
            model_path, segment_duration=segment_duration, overlap=overlap,
            sample_rate=sample_rate, mode="threshold",
            crackle_threshold=crackle_threshold, wheeze_threshold=wheeze_threshold,
        )

    def visualize_results(self, results, audio, save_path=None, show=True):
        viz.three_panel(
            results, audio, self.sample_rate,
            crackle_threshold=self.crackle_threshold,
            wheeze_threshold=self.wheeze_threshold,
            save_path=save_path, show=show,
        )


def main():
    parser = argparse.ArgumentParser(
        description="Respiratory sound analyzer with configurable thresholds"
    )
    parser.add_argument("--audio", type=str, required=True)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--segment-duration", type=float, default=1.0)
    parser.add_argument("--overlap", type=float, default=0.5)
    parser.add_argument("--crackle-threshold", type=float, default=0.3,
                        help="Detection threshold for crackles (0-1, default: 0.3)")
    parser.add_argument("--wheeze-threshold", type=float, default=0.3,
                        help="Detection threshold for wheezes (0-1, default: 0.3)")
    parser.add_argument("--output-dir", type=str, default="analysis_results")
    parser.add_argument("--device", type=str, choices=["cuda", "cpu", "tpu"], default="tpu")
    parser.add_argument("--no-display", action="store_true")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(exist_ok=True)

    analyzer = ConfigurableAudioAnalyzer(
        model_path=args.model,
        segment_duration=args.segment_duration,
        overlap=args.overlap,
        crackle_threshold=args.crackle_threshold,
        wheeze_threshold=args.wheeze_threshold,
    )
    results, audio = analyzer.analyze_audio(args.audio)
    analyzer.print_summary(results)

    audio_name = Path(args.audio).stem
    analyzer.visualize_results(
        results, audio,
        save_path=str(output_dir / f"{audio_name}_analysis_t{args.crackle_threshold:.2f}.png"),
        show=not args.no_display,
    )
    analyzer.export_results(
        results, str(output_dir / f"{audio_name}_results_t{args.crackle_threshold:.2f}.csv")
    )
    print(f"\n✓ Results saved to: {output_dir}")


if __name__ == "__main__":
    main()
