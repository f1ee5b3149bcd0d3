"""Unit tests for the accuracy-benchmark harness plumbing (no training).

The trained results in benchmarks/ACCURACY.md are produced by
benchmarks/accuracy_bench.py on the TPU; these tests pin the host-side
machinery: dataset generation keying, per-seed aggregation, and table
rendering.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "benchmarks"))

import accuracy_bench as ab  # noqa: E402


def _row(arm, icbhi, acc, seed=42):
    return {
        "layout": "segmented",
        "arm": arm,
        "epochs": 5,
        "wall_s": 1.0,
        "best_epoch": 3,
        "best_icbhi": icbhi,
        "val_acc_at_best_pct": acc,
        "sensitivity_at_best": 0.5,
        "specificity_at_best": 0.9,
        "final_val_acc_pct": acc,
        "seed": seed,
    }


class TestTable:
    def test_single_seed_table_has_per_run_columns(self):
        lines = ab._table([_row("full", 0.8, 80.0), _row("none", 0.9, 90.0)])
        assert "best epoch" in lines[0] and "wall" in lines[0]
        assert any("| full | 0.8000 |" in l for l in lines)

    def test_multi_seed_table_aggregates_mean_std(self):
        rows = [
            _row("full", 0.8, 80.0, seed=1),
            _row("full", 0.6, 60.0, seed=2),
            _row("none", 0.9, 90.0, seed=1),
            _row("none", 0.9, 90.0, seed=2),
        ]
        lines = ab._table(rows)
        assert "seeds" in lines[0]
        full_line = next(l for l in lines if l.startswith("| full"))
        assert "0.7000 ± 0.1000" in full_line and "| 2 |" in full_line
        none_line = next(l for l in lines if l.startswith("| none"))
        assert "0.9000 ± 0.0000" in none_line

    def test_mean_full_prefers_full_arm(self):
        rows = [_row("full", 0.8, 80.0), _row("full", 0.6, 60.0), _row("none", 0.99, 99.0)]
        m = ab._mean_full(rows)
        assert abs(m["best_icbhi"] - 0.7) < 1e-9
        assert abs(m["val_acc_at_best_pct"] - 70.0) < 1e-9
        assert ab._mean_full([_row("none", 0.9, 90.0)]) is None


class TestMakeDataset:
    def test_stamp_prevents_regeneration(self, tmp_path, capsys):
        root = tmp_path / "ds"
        ab.make_dataset("segmented", root, total=8, seed=0, duration=1.0)
        wavs = sorted(p.name for p in root.rglob("*.wav"))
        assert wavs
        ab.make_dataset("segmented", root, total=8, seed=0, duration=1.0)
        assert "Reusing" in capsys.readouterr().out
        assert sorted(p.name for p in root.rglob("*.wav")) == wavs

    def test_recording_layout_writes_annotations(self, tmp_path):
        root = tmp_path / "rec"
        ab.make_dataset("recording", root, total=3, seed=0, duration=3.0)
        assert len(list((root / "audio_and_txt_files").glob("*.wav"))) == 3
        assert len(list((root / "audio_and_txt_files").glob("*.txt"))) == 3
