#!/usr/bin/env python
"""Base sliding-window analyzer (3-panel visualization, legacy detection).

Contract matches reference realtime_analyzer.py:467-553: same flags,
{stem}_analysis.png + {stem}_results.csv outputs, and the ORIGINAL detection
semantics (has_x = p_x>0.5 or p_both>0.5; confidences p_x+p_both unclamped,
reference :227-232). The reference's sequential per-segment temp-wav loop
(:184-271) is replaced by one jitted batched graph.
"""

import argparse
from pathlib import Path

from audio_classification_icbhi_tpu.analyzers import AnalyzerEngine, viz


class ParallelAudioAnalyzer(AnalyzerEngine):
    """Name kept for API parity with reference realtime_analyzer.py:45
    (which, despite the name, ran sequentially — SURVEY.md quirk ledger)."""

    def __init__(self, model_path, segment_duration=1.0, overlap=0.5,
                 sample_rate=16000, n_workers=4, device=None):
        super().__init__(
            model_path, segment_duration=segment_duration, overlap=overlap,
            sample_rate=sample_rate, mode="legacy",
        )

    def visualize_results(self, results, audio, save_path=None, show=True):
        viz.three_panel(results, audio, self.sample_rate, save_path=save_path, show=show)


def main():
    parser = argparse.ArgumentParser(
        description="Real-time respiratory sound analyzer with parallel processing"
    )
    parser.add_argument("--audio", type=str, required=True, help="Path to audio file (max 15 seconds)")
    parser.add_argument("--model", type=str, required=True, help="Path to trained model checkpoint")
    parser.add_argument("--segment-duration", type=float, default=1.0)
    parser.add_argument("--overlap", type=float, default=0.5)
    parser.add_argument("--output-dir", type=str, default="analysis_results")
    parser.add_argument("--device", type=str, choices=["cuda", "cpu", "tpu"], default="tpu")
    parser.add_argument("--no-display", action="store_true")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(exist_ok=True)

    analyzer = ParallelAudioAnalyzer(
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
