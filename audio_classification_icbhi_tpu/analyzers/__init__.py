"""Streaming sliding-window analyzers.

The reference ships five analyzer scripts that differ only in detection
semantics and presentation (realtime_analyzer*.py; SURVEY.md §3.4, §7).
Here they collapse into ONE engine — a single jitted graph
windows -> flexible mel -> vmapped classifier -> probabilities — with the
per-script differences expressed as detection modes and visualization
styles. The reference's per-segment temp-wav round-trip
(realtime_analyzer_parallel.py:179-191) is eliminated entirely.
"""

from audio_classification_icbhi_tpu.analyzers.engine import (  # noqa: F401
    AnalyzerEngine,
    SegmentResult,
)
from audio_classification_icbhi_tpu.analyzers import viz  # noqa: F401
