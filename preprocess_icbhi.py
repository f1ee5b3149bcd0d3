#!/usr/bin/env python
"""Offline ETL: segment ICBHI recordings into per-cycle labeled wavs
(reference preprocess_icbhi.py:21-239)."""

import argparse

from audio_classification_icbhi_tpu.data.segmenter import ICBHISegmenter


def main():
    parser = argparse.ArgumentParser(description="Segment ICBHI recordings by breathing cycle")
    parser.add_argument(
        "--input-dir", type=str, default="data/ICBHI/audio_and_txt_files",
        help="Directory with paired .wav/.txt recordings",
    )
    parser.add_argument(
        "--output-dir", type=str, default="data/ICBHI_segmented",
        help="Output root (per-class subdirectories)",
    )
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--min-duration", type=float, default=0.5)
    args = parser.parse_args()

    segmenter = ICBHISegmenter(
        args.input_dir, args.output_dir,
        sample_rate=args.sample_rate, min_duration=args.min_duration,
    )
    segmenter.process_all()


if __name__ == "__main__":
    main()
