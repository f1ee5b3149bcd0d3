#!/usr/bin/env python
"""Batched-inference analyzer (reference realtime_analyzer_parallel_p.py:24-135:
subclass of the base analyzer with stacked-batch GPU inference). In this
framework batching is the engine's native mode, so BatchAudioAnalyzer is the
base analyzer; the class is kept because interactive_analyzer imports it
(the reference's own import of it was broken — SURVEY.md quirk ledger)."""

import argparse
from pathlib import Path

from realtime_analyzer import ParallelAudioAnalyzer


class BatchAudioAnalyzer(ParallelAudioAnalyzer):
    """Stacked-batch inference over all windows at once (always true here)."""


def main():
    parser = argparse.ArgumentParser(
        description="Real-time respiratory sound analyzer with batch processing"
    )
    parser.add_argument("--audio", type=str, required=True)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--segment-duration", type=float, default=1.0)
    parser.add_argument("--overlap", type=float, default=0.5)
    parser.add_argument("--output-dir", type=str, default="analysis_results")
    parser.add_argument("--device", type=str, choices=["cuda", "cpu", "tpu"], default="tpu")
    parser.add_argument("--no-display", action="store_true")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(exist_ok=True)

    analyzer = BatchAudioAnalyzer(
        model_path=args.model, segment_duration=args.segment_duration, overlap=args.overlap
    )
    results, audio = analyzer.analyze_audio(args.audio)
    analyzer.print_summary(results)

    audio_name = Path(args.audio).stem
    analyzer.visualize_results(
        results, audio,
        save_path=str(output_dir / f"{audio_name}_analysis.png"),
        show=not args.no_display,
    )
    analyzer.export_results(results, str(output_dir / f"{audio_name}_results.csv"))
    print(f"\n✓ All results saved to: {output_dir}")


if __name__ == "__main__":
    main()
