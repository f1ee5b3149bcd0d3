"""Smoke tests for benchmarks/headline_bench.py (host-side plumbing only).

The real artifact (benchmarks/HEADLINE.md) is generated on the TPU; a full
run even at toy scale costs minutes of CPU compile, so these guard the
host-side pieces a refactor could silently break: the accuracy-sweep
reader and the report writer (including the ratio arithmetic against the
reference claims from /root/reference/README.md:177-180).
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "headline_bench", REPO / "benchmarks" / "headline_bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["headline_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_read_accuracy_matches_committed_sweep():
    hb = _load_module()
    acc = hb.read_accuracy()
    rows = json.loads(
        (REPO / "benchmarks" / "accuracy_results.json").read_text())
    seg_full = [r for r in rows
                if r["layout"] == "segmented" and r["arm"] == "full"]
    assert acc["seeds"] == len(seg_full) >= 3
    assert 0 < acc["val_acc_pct_mean"] <= 100
    assert 0 < acc["icbhi_score_mean"] <= 1


def test_write_report_renders_and_rounds(tmp_path, monkeypatch):
    hb = _load_module()
    monkeypatch.setattr(hb, "HERE", tmp_path)
    results = {
        "platform": "tpu",
        "training": {"epochs": 100, "train_clips": 6210, "val_clips": 345,
                     "opt_steps_per_epoch": 49, "wall_s": 225.0,
                     "warm_wall_s": 90.0,
                     "s_per_epoch": 0.9, "ms_per_step": 18.4,
                     "final_val_acc_pct": 83.0, "best_val_loss": 0.41},
        "latency": {"batch1_e2e_ms_median": 51.2, "batch1_e2e_ms_p10": 47.5,
                    "sync_rpc_floor_ms_median": 50.0,
                    "batch1_onchip_ms": 0.0625,
                    "dispatch_pipelined_ms": 0.5,
                    "local_sync_floor_ms_median": 0.007,
                    "batch1_colocated_est_ms": 0.07,
                    "batch128_clips_per_sec": 58000.0,
                    "batch128_amortized_ms_per_clip": 0.0172},
        "memory": {"train_step": {}, "inference_batch128": {},
                   "dataset_cache_bytes": 27648000,
                   "train_peak_gb": 0.11, "train_peak_no_cache_gb": 0.085,
                   "inference_peak_gb": 0.096},
        "accuracy": {"layout": "segmented", "arm": "full", "seeds": 3,
                     "val_acc_pct_mean": 84.6, "val_acc_pct_std": 4.5,
                     "icbhi_score_mean": 0.824},
    }
    hb.write_report(results)
    md = (tmp_path / "HEADLINE.md").read_text()
    # training speedup ratios: 2.5 h / 225 s cold = 40x, / 90 s warm = 100x
    assert "**225 s** cold / **90 s** warm" in md
    assert "**40x / 100x**" in md
    # on-chip latency ratio = 10 ms / 0.0625 ms = 160x, decomposition shown
    assert "160x on-chip" in md
    assert "0.0625 ms on-chip" in md
    assert "zero-work RPC floor is 50.0 ms" in md
    assert "0.11 GB" in md and "< 3.5 GB" in md
    round_trip = json.loads((tmp_path / "headline_results.json").read_text())
    assert round_trip == results


def test_skip_train_reuses_previous_block(tmp_path, monkeypatch):
    hb = _load_module()
    monkeypatch.setattr(hb, "HERE", tmp_path)
    (tmp_path / "headline_results.json").write_text(
        json.dumps({"training": {"epochs": 100, "wall_s": 90.0}}))
    prev = json.loads((tmp_path / "headline_results.json").read_text())
    assert prev["training"]["wall_s"] == 90.0
