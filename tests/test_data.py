"""Data pipeline tests: WAV I/O, annotations, datasets, loader, segmenter.

Covers the behaviors the reference exercises manually via __main__ blocks
and diagnose_data.py (SURVEY.md §4).
"""

import numpy as np
import pytest
from struct import error as struct_error

from audio_classification_icbhi_tpu.data import (
    BatchLoader,
    ICBHIDataset,
    ICBHISegmentedDataset,
    ICBHISegmenter,
    generate_icbhi_dataset,
    generate_segmented_dataset,
    load_audio,
    read_wav,
    recording_label,
    write_wav,
)
from audio_classification_icbhi_tpu.data.annotations import (
    SEGMENT_DIR_NAMES,
    label_from_flags,
    parse_annotation_file,
)
from audio_classification_icbhi_tpu.data.synthetic import (
    ICBHI_CLASS_PROBS,
    icbhi_class_counts,
    synth_respiratory_cycle,
)
from audio_classification_icbhi_tpu.data.wavio import resample_np


@pytest.fixture(scope="module")
def icbhi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("icbhi")
    generate_icbhi_dataset(root, num_recordings=10, cycles_per_recording=3)
    return root


@pytest.fixture(scope="module")
def segmented_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("icbhi_seg")
    generate_segmented_dataset(root, per_class=6, duration=1.0)
    return root


CFG = {
    "data": {
        "sample_rate": 16000,
        "n_mels": 128,
        "n_fft": 2048,
        "hop_length": 512,
        "duration": 3.0,
        "train_split": 0.7,
        "val_split": 0.15,
    }
}


class TestWavIO:
    @pytest.mark.parametrize("dtype", ["int16", "float32"])
    def test_roundtrip(self, tmp_path, rng, dtype):
        x = (0.5 * rng.standard_normal(8000)).astype(np.float32)
        p = tmp_path / "a.wav"
        write_wav(p, x, 16000, dtype=dtype)
        y, sr = read_wav(p)
        assert sr == 16000 and y.shape == (1, 8000)
        if dtype == "int16":
            np.testing.assert_allclose(y[0], np.clip(x, -1, 1), atol=1e-4)
        else:  # float32 stores samples verbatim, no clipping
            np.testing.assert_array_equal(y[0], x)

    def test_stereo_mono_mix(self, tmp_path, rng):
        x = rng.standard_normal((2, 4000)).astype(np.float32) * 0.3
        p = tmp_path / "st.wav"
        write_wav(p, x, 22050)
        mono, sr = load_audio(p)
        assert sr == 22050
        # int16 encoding clips at +-1 before the mono mix
        np.testing.assert_allclose(mono, np.clip(x, -1, 1).mean(axis=0), atol=1e-4)

    def test_load_audio_resamples(self, tmp_path, rng):
        x = (0.5 * rng.standard_normal(44100)).astype(np.float32)
        p = tmp_path / "r.wav"
        write_wav(p, x, 44100, dtype="float32")
        y, sr = load_audio(p, target_sr=16000)
        assert sr == 16000 and y.shape == (16000,)

    def test_resample_np_matches_device_kernel(self, rng):
        import jax.numpy as jnp
        from audio_classification_icbhi_tpu.ops import resample as dev_resample
        x = rng.standard_normal(22050).astype(np.float32)
        host = resample_np(x, 22050, 16000)
        dev = np.asarray(dev_resample(jnp.asarray(x), 22050, 16000))
        assert host.shape == dev.shape
        np.testing.assert_allclose(host, dev, atol=1e-4)

    def test_pcm24_decode(self, tmp_path, rng):
        """Hand-craft a 24-bit PCM WAV (the writer only emits 16/32f)."""
        import struct

        x = (0.5 * rng.standard_normal(1000)).clip(-1, 1)
        vals = (x * (1 << 23)).astype(np.int32).clip(-(1 << 23), (1 << 23) - 1)
        payload = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * 3, 3, 24)
        hdr += b"data" + struct.pack("<I", len(payload))
        p = tmp_path / "p24.wav"
        p.write_bytes(hdr + payload)
        y, sr = read_wav(p)
        assert sr == 8000
        np.testing.assert_allclose(y[0], vals / float(1 << 23), atol=1e-6)
        # the native decoder agrees bit-for-bit
        from audio_classification_icbhi_tpu import native

        if native.available():
            mono, nsr = native.decode_mono(p)
            np.testing.assert_array_equal(mono, y[0].astype(np.float32))

    def test_truncated_data_chunk_rejected(self, tmp_path, rng):
        """A data chunk whose declared size runs past EOF (partial
        download / corrupt file) must raise, not silently return a
        shortened clip the dataset would pad to near-silence."""
        p = tmp_path / "good.wav"
        write_wav(p, (0.3 * rng.standard_normal(4000)).astype(np.float32), 16000)
        raw = p.read_bytes()
        bad = tmp_path / "trunc.wav"
        bad.write_bytes(raw[: len(raw) - 1000])  # cut mid-data-chunk
        with pytest.raises(ValueError, match="truncated"):
            read_wav(bad)

    def test_zero_channels_rejected(self, tmp_path):
        import struct

        hdr = b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 0, 8000, 0, 0, 16)
        hdr += b"data" + struct.pack("<I", 0)
        p = tmp_path / "zc.wav"
        p.write_bytes(hdr)
        with pytest.raises(ValueError, match="channels"):
            read_wav(p)

    def test_pad_or_crop_contract(self):
        """End-pad / center-crop (reference preprocessing.py:70-83) — the
        single shared implementation behind datasets and inference."""
        from audio_classification_icbhi_tpu.data.wavio import pad_or_crop

        short = np.arange(4, dtype=np.float32)
        out = pad_or_crop(short, 6)
        np.testing.assert_array_equal(out, [0, 1, 2, 3, 0, 0])
        long = np.arange(10, dtype=np.float32)
        np.testing.assert_array_equal(pad_or_crop(long, 4), [3, 4, 5, 6])
        same = np.arange(5, dtype=np.float32)
        assert pad_or_crop(same, 5) is same

    def test_decoder_fuzz_no_crash(self, tmp_path, rng):
        """Seeded structural fuzz of both decoders (python + native): random
        byte flips, truncations, and size-field corruptions of a valid WAV
        must either decode or raise/return an error — never crash the
        process (the native path runs in GIL-free threads where an escaped
        exception would std::terminate; guards + ERR_ALLOC pin this)."""
        from audio_classification_icbhi_tpu import native

        base_p = tmp_path / "base.wav"
        write_wav(base_p, (0.3 * rng.standard_normal(2000)).astype(np.float32), 8000)
        base = bytearray(base_p.read_bytes())
        paths = []
        for i in range(120):
            raw = bytearray(base)
            kind = i % 3
            if kind == 0:  # flip a few bytes anywhere (incl. headers)
                for _ in range(3):
                    raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
            elif kind == 1:  # truncate
                raw = raw[: int(rng.integers(0, len(raw)))]
            else:  # corrupt a chunk-size field with a huge value
                off = int(rng.integers(0, max(len(raw) - 4, 1)))
                raw[off : off + 4] = int(rng.integers(0, 2**32)).to_bytes(4, "little")
            p = tmp_path / f"fuzz_{i}.wav"
            p.write_bytes(bytes(raw))
            paths.append(p)
            try:
                read_wav(p)  # python codec: decode or ValueError
            except (ValueError, struct_error):
                pass
            if native.available():
                native.decode_mono(p)  # native: result or None, never abort
        if native.available():
            # batched native decode over the whole fuzz corpus in one call
            out = native.decode_batch(paths, target_len=2000, n_threads=4)
            assert out is not None and out[0].shape == (len(paths), 2000)

    def test_float64_decode(self, tmp_path, rng):
        import struct

        x = rng.standard_normal(500)
        payload = x.astype("<f8").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 16000 * 8, 8, 64)
        hdr += b"data" + struct.pack("<I", len(payload))
        p = tmp_path / "f64.wav"
        p.write_bytes(hdr + payload)
        y, sr = read_wav(p)
        np.testing.assert_allclose(y[0], x.astype(np.float32), atol=1e-7)

    def test_wave_format_extensible(self, tmp_path, rng):
        """WAVE_FORMAT_EXTENSIBLE wrapper around PCM16."""
        import struct

        x = (0.3 * rng.standard_normal(400)).astype(np.float32)
        payload = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        # fmt chunk: extensible (0xFFFE), cbSize 22, subformat GUID leads
        # with the real format code (1 = PCM)
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
        # cbSize=22, validBits=16, channelMask=0, then SubFormat GUID whose
        # first two bytes carry the real format code (1 = PCM)
        fmt += struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) + b"\x00" * 14
        hdr = b"RIFF" + struct.pack("<I", 20 + len(fmt) + 8 + len(payload)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        hdr += b"data" + struct.pack("<I", len(payload))
        p = tmp_path / "ext.wav"
        p.write_bytes(hdr + payload)
        y, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(y[0], np.clip(x, -1, 1), atol=1e-4)

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"this is not a wav file at all")
        with pytest.raises(ValueError, match="not a RIFF"):
            read_wav(p)

    def test_extensible_with_decoy_fmt_in_list_chunk(self, tmp_path, rng):
        """Regression (advisor r1): the EXTENSIBLE sub-format was read via
        raw.find(b'fmt '), which matches those bytes inside any earlier
        chunk (e.g. a LIST/INFO comment). The sub-format must come from the
        real fmt chunk's body."""
        import struct

        x = (0.3 * rng.standard_normal(300)).astype(np.float32)
        payload = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        # LIST chunk whose body contains the decoy bytes "fmt " followed by
        # garbage that would decode to an unsupported format code
        decoy = b"INFOICMT" + struct.pack("<I", 12) + b"fmt garbage."
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 0) + struct.pack("<H", 1) + b"\x00" * 14
        body = b"LIST" + struct.pack("<I", len(decoy)) + decoy
        body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(payload)) + payload
        hdr = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"
        p = tmp_path / "decoy.wav"
        p.write_bytes(hdr + body)
        y, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(y[0], np.clip(x, -1, 1), atol=1e-4)

    def test_truncated_fmt_chunk_raises(self, tmp_path):
        """Regression (advisor r1): a short fmt chunk must raise cleanly,
        not read out of bounds (mirrors the fastwav.cc hardening)."""
        import struct

        fmt = struct.pack("<HHI", 1, 1, 16000)  # only 8 of 16 required bytes
        hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        hdr += b"data" + struct.pack("<I", 0)
        p = tmp_path / "shortfmt.wav"
        p.write_bytes(hdr)
        with pytest.raises(ValueError, match="truncated fmt"):
            read_wav(p)

    def test_truncated_extensible_fmt_raises(self, tmp_path):
        import struct

        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)  # no GUID
        hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        hdr += b"data" + struct.pack("<I", 0)
        p = tmp_path / "shortext.wav"
        p.write_bytes(hdr)
        with pytest.raises(ValueError, match="truncated EXTENSIBLE"):
            read_wav(p)


class TestAnnotations:
    def test_label_mapping(self):
        assert label_from_flags(0, 0) == 0
        assert label_from_flags(1, 0) == 1
        assert label_from_flags(0, 1) == 2
        assert label_from_flags(1, 1) == 3

    def test_parse_and_recording_label(self, tmp_path):
        txt = tmp_path / "x.txt"
        txt.write_text("0.0\t2.5\t1\t0\n2.5\t5.0\t0\t1\nmalformed line\n")
        cycles = parse_annotation_file(txt)
        assert len(cycles) == 2
        assert recording_label(txt) == 3  # crackles OR + wheezes OR -> both

    def test_all_normal(self, tmp_path):
        txt = tmp_path / "n.txt"
        txt.write_text("0\t2\t0\t0\n2\t4\t0\t0\n")
        assert recording_label(txt) == 0


class TestDatasets:
    def test_whole_recording_split_sizes(self, icbhi_root):
        train = ICBHIDataset(icbhi_root, "train", CFG)
        val = ICBHIDataset(icbhi_root, "val", CFG)
        test = ICBHIDataset(icbhi_root, "test", CFG)
        assert len(train) == 7 and len(val) == 1 and len(test) == 2
        # Positional split on the sorted list: no overlap
        paths = {p for p, _ in train.data} | {p for p, _ in val.data} | {p for p, _ in test.data}
        assert len(paths) == 10

    def test_item_shape_fixed(self, icbhi_root):
        ds = ICBHIDataset(icbhi_root, "train", CFG)
        wav, label = ds[0]
        assert wav.shape == (48000,) and wav.dtype == np.float32
        assert 0 <= label <= 3

    def test_segmented_split_and_shuffle_determinism(self, segmented_root):
        a = ICBHISegmentedDataset(segmented_root, "train", CFG)
        b = ICBHISegmentedDataset(segmented_root, "train", CFG)
        assert [p for p, _ in a.data] == [p for p, _ in b.data]  # seed-42 shuffle
        assert len(a) == int(0.7 * 24)

    def test_segmented_bad_split_renormalized(self, segmented_root, capsys):
        cfg = {"data": {**CFG["data"], "train_split": 0.75, "val_split": 0.45}}
        test = ICBHISegmentedDataset(segmented_root, "test", cfg)
        assert len(test) > 0  # reference would produce an empty test set here
        assert "renormalizing" in capsys.readouterr().out

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(ValueError):
            ICBHIDataset(tmp_path / "nope", "train", CFG)
        with pytest.raises(ValueError):
            ICBHISegmentedDataset(tmp_path / "nope2", "train", CFG)

    def test_segmented_config_without_data_section(self, segmented_root):
        """A config lacking a 'data' key must fall back to split defaults
        (regression: __init__ tolerated it, _split_data KeyError'd)."""
        ds = ICBHISegmentedDataset(segmented_root, "train", {"model": {}})
        assert len(ds) == int(0.7 * 24)


class TestBatchLoader:
    def test_shapes_order_and_drop_last(self, segmented_root):
        ds = ICBHISegmentedDataset(segmented_root, "train", CFG)
        loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True)
        batches = list(loader)
        assert len(batches) == len(ds) // 4 == len(loader)
        for wavs, labels in batches:
            assert wavs.shape == (4, 48000) and labels.shape == (4,)
        # Unshuffled loader preserves dataset order
        np.testing.assert_array_equal(
            np.concatenate([lbl for _, lbl in batches]),
            ds.labels[: len(batches) * 4],
        )

    def test_shuffle_deterministic_per_epoch(self, segmented_root):
        ds = ICBHISegmentedDataset(segmented_root, "train", CFG)
        l1 = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
        l2 = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
        a = np.concatenate([lbl for _, lbl in l1])
        b = np.concatenate([lbl for _, lbl in l2])
        np.testing.assert_array_equal(a, b)
        # second epoch differs from first
        c = np.concatenate([lbl for _, lbl in l1])
        assert not np.array_equal(a, c)

    def test_no_deadlock_under_reordering(self, segmented_root):
        """Regression: out-of-order completions must not exhaust the
        prefetch slots (deadlock found live: workers parked on acquire,
        consumer parked on get). prefetch=1 + 4 threads maximizes skew."""
        ds = ICBHISegmentedDataset(segmented_root, "train", CFG)
        for _ in range(3):
            loader = BatchLoader(ds, batch_size=2, num_threads=4, prefetch=1)
            total = sum(len(lbl) for _, lbl in loader)
            assert total == len(ds)

    def test_decode_error_propagates(self, tmp_path, rng):
        """A worker hitting an unreadable file must surface the exception to
        the consumer, not hang or silently drop the batch."""
        from audio_classification_icbhi_tpu.data.annotations import SEGMENT_DIR_NAMES

        d = tmp_path / SEGMENT_DIR_NAMES[0]
        d.mkdir(parents=True)
        write_wav(d / "ok.wav", (0.1 * rng.standard_normal(8000)).astype(np.float32), 16000)
        (d / "bad.wav").write_bytes(b"definitely not audio")
        ds = ICBHISegmentedDataset(
            tmp_path, "train",
            {"data": {**CFG["data"], "train_split": 1.0, "val_split": 0.0}},
        )

        class NoBatch:
            """Hide load_batch so the loader exercises the per-item path
            (the native fast path zero-fills bad rows by design)."""

            def __init__(self, inner):
                self._inner = inner

            def __len__(self):
                return len(self._inner)

            def __getitem__(self, i):
                return self._inner[i]

        loader = BatchLoader(NoBatch(ds), batch_size=1, num_threads=2)
        with pytest.raises(ValueError, match="not a RIFF"):
            list(loader)

    def test_last_partial_batch_kept_without_drop(self, segmented_root):
        ds = ICBHISegmentedDataset(segmented_root, "val", CFG)
        loader = BatchLoader(ds, batch_size=4, drop_last=False)
        total = sum(len(lbl) for _, lbl in loader)
        assert total == len(ds)

    def test_one_slow_batch_bounds_lookahead(self):
        """Backpressure regression: with batch 0 slow and everything else
        instant, workers must not decode unboundedly far ahead (the old
        semaphore released slots when out-of-order batches were parked, so
        one slow batch let a fast worker buffer O(all batches) in RAM).
        The lookahead window bounds completions ahead of the consumer to
        prefetch + num_threads."""
        import threading
        import time as _time

        gate = threading.Event()
        done: list[int] = []
        lock = threading.Lock()

        class SkewDataset:
            def __len__(self):
                return 64  # 64 batches of 1

            def load_batch(self, idxs):
                i = int(idxs[0])
                if i == 0:
                    gate.wait(10.0)  # batch 0 finishes LAST
                with lock:
                    done.append(i)
                return (np.zeros((1, 8), np.float32), np.zeros((1,), np.int32))

        loader = BatchLoader(SkewDataset(), batch_size=1,
                             num_threads=4, prefetch=2)
        it = iter(loader)

        def first():
            next(it)

        t = threading.Thread(target=first)
        t.start()
        _time.sleep(1.0)  # give fast workers every chance to run ahead
        with lock:
            ahead = len(done)
        gate.set()
        t.join(10.0)
        rest = list(it)
        assert len(rest) == 63
        # window = prefetch + num_threads = 6 (small slack for batches that
        # passed the window check before batch 0 stalled the cursor)
        assert ahead <= 6 + 4, f"{ahead} batches decoded ahead of a stuck batch 0"


class TestNativeBatchPath:
    def test_load_batch_matches_getitem(self, segmented_root):
        ds = ICBHISegmentedDataset(segmented_root, "train", CFG)
        idxs = [0, 3, 5]
        batch, labels = ds.load_batch(idxs)
        assert batch.shape == (3, ds.target_length)
        for row, i in enumerate(idxs):
            wav, lbl = ds[i]
            assert lbl == labels[row]
            np.testing.assert_allclose(batch[row], wav, atol=1e-6)

    def test_load_batch_resamples_mismatched_rate(self, tmp_path, rng):
        # one file at a different sample rate forces the per-row fallback
        from audio_classification_icbhi_tpu.data.annotations import SEGMENT_DIR_NAMES

        d = tmp_path / SEGMENT_DIR_NAMES[0]
        d.mkdir(parents=True)
        write_wav(d / "a.wav", (0.2 * rng.standard_normal(16000)).astype(np.float32), 16000)
        write_wav(d / "b.wav", (0.2 * rng.standard_normal(22050)).astype(np.float32), 22050)
        ds = ICBHISegmentedDataset(tmp_path, "train", {"data": {**CFG["data"], "train_split": 1.0, "val_split": 0.0}})
        batch, labels = ds.load_batch(range(len(ds)))
        for row in range(len(ds)):
            np.testing.assert_allclose(batch[row], ds[row][0], atol=1e-6)


class TestSegmenter:
    def test_etl_roundtrip(self, icbhi_root, tmp_path):
        seg = ICBHISegmenter(icbhi_root / "audio_and_txt_files", tmp_path / "out")
        stats = seg.process_all()
        assert stats["processed_files"] == 10
        assert stats["total_segments"] > 0
        assert (tmp_path / "out" / "segmentation_stats.json").exists()
        # every written segment is loadable and labeled by its directory
        ds = ICBHISegmentedDataset(tmp_path / "out", "train", CFG)
        wav, label = ds[0]
        assert wav.shape == (48000,)

    def test_min_duration_skips(self, tmp_path, rng):
        d = tmp_path / "in"
        d.mkdir()
        x = rng.standard_normal(16000).astype(np.float32) * 0.1
        write_wav(d / "a.wav", x, 16000)
        (d / "a.txt").write_text("0.0\t0.2\t0\t0\n0.3\t0.9\t1\t0\n")
        seg = ICBHISegmenter(d, tmp_path / "o", min_duration=0.5)
        stats = seg.process_all()
        assert stats["skipped_segments"] == 1
        assert stats["crackle"] == 1


class TestHardSyntheticRegime:
    """Non-separable regime for honest accuracy benchmarking
    (benchmarks/accuracy_bench.py; VERDICT r1 #2)."""

    def test_icbhi_skew_counts(self):
        counts = icbhi_class_counts(1000)
        assert sum(counts) in range(995, 1006)
        assert counts[0] > counts[1] > counts[2] > counts[3]
        # real ICBHI proportions: 52.8/27.0/12.8/7.3%
        assert counts == (528, 270, 128, 73)

    def test_hard_dataset_layout_and_skew(self, tmp_path):
        root = generate_segmented_dataset(
            tmp_path / "hard", hard=True, duration=1.0,
            class_counts=(8, 4, 2, 1), seed=3,
        )
        sizes = [len(list((root / d).glob("*.wav"))) for d in SEGMENT_DIR_NAMES]
        assert sizes == [8, 4, 2, 1]

    def test_hard_cycles_are_not_trivially_separable(self):
        """The easy regime separates classes by raw energy/peak alone; the
        hard regime must not (events near the noise floor + confusers +
        gain roll). Guard: a peak-amplitude threshold classifier on 0-vs-1
        stays far from perfect."""
        rng = np.random.default_rng(0)
        peaks = {0: [], 1: []}
        for lab in (0, 1):
            for _ in range(40):
                x = synth_respiratory_cycle(rng, lab, 1.0, 16000, hard=True)
                peaks[lab].append(float(np.abs(x).max()))
        thresh = np.median(peaks[0] + peaks[1])
        acc = (np.mean(np.asarray(peaks[0]) <= thresh)
               + np.mean(np.asarray(peaks[1]) > thresh)) / 2
        assert acc < 0.8, f"peak threshold separates hard regime too well ({acc:.2f})"

    def test_dense_coverage_spans_the_cycle(self):
        """coverage="dense" (VERDICT r2 #2) must make event evidence
        temporally redundant: crackle trains land far more events and the
        wheeze gate spans >= 70% of the cycle, so a 35-frame time mask
        cannot delete a clip's only labeled energy."""
        from audio_classification_icbhi_tpu.data.synthetic import (
            _add_crackles_hard,
            _add_wheeze_hard,
        )

        sr, n = 16000, 32000
        counts = {}
        for cov in ("sparse", "dense"):
            rng = np.random.default_rng(5)
            hits = 0
            for _ in range(10):
                x = _add_crackles_hard(rng, np.zeros(n, np.float32), sr,
                                       coverage=cov)
                # 100 ms windows containing any crackle energy
                w = np.abs(x).reshape(20, -1).max(axis=1)
                hits += int((w > 0).sum())
            counts[cov] = hits
        assert counts["dense"] > 2 * counts["sparse"], counts

        rng = np.random.default_rng(5)
        for _ in range(10):
            x = _add_wheeze_hard(rng, np.zeros(n, np.float32), sr,
                                 coverage="dense")
            nz = np.flatnonzero(np.abs(x) > 0)
            assert (nz[-1] - nz[0]) >= 0.69 * n

    def test_hard_deterministic_and_bounded(self):
        a = synth_respiratory_cycle(np.random.default_rng(7), 3, 1.5, 16000, hard=True)
        b = synth_respiratory_cycle(np.random.default_rng(7), 3, 1.5, 16000, hard=True)
        np.testing.assert_array_equal(a, b)
        assert np.abs(a).max() <= 0.99 + 1e-6
        assert a.dtype == np.float32

    def test_hard_whole_recording_layout(self, tmp_path):
        root = generate_icbhi_dataset(
            tmp_path / "rec", num_recordings=3, cycles_per_recording=2,
            hard=True, class_probs=ICBHI_CLASS_PROBS, seed=0,
        )
        wavs = list((root / "audio_and_txt_files").glob("*.wav"))
        txts = list((root / "audio_and_txt_files").glob("*.txt"))
        assert len(wavs) == 3 and len(txts) == 3

    def test_hard_recording_label_matches_annotation_or(self, tmp_path):
        """Hard recordings draw a recording-level label and generate cycles
        whose OR equals it — the annotation contract recording_label reads
        (patient-disjoint benchmark relies on this)."""
        from audio_classification_icbhi_tpu.data.annotations import recording_label

        rng_labels = []
        root = generate_icbhi_dataset(
            tmp_path / "rec2", num_recordings=30, cycles_per_recording=3,
            hard=True, class_probs=ICBHI_CLASS_PROBS, seed=5,
        )
        for txt in sorted((root / "audio_and_txt_files").glob("*.txt")):
            rng_labels.append(recording_label(txt))
        # skewed draw: normals must dominate, every label reachable by OR
        assert rng_labels.count(0) > rng_labels.count(3)
        assert set(rng_labels) <= {0, 1, 2, 3}

    def test_patient_profile_pins_gain(self):
        """All cycles of one profile share the patient's gain/SNR factors;
        different profiles differ (the distribution shift under the
        patient-disjoint split)."""
        from audio_classification_icbhi_tpu.data.synthetic import make_patient_profile

        rng = np.random.default_rng(0)
        p1 = make_patient_profile(rng)
        p2 = make_patient_profile(rng)
        assert p1 != p2
        assert set(p1) == {"gain_db", "snr_bias_db", "noise_exp", "heart_p",
                           "heart_amp", "hum_p", "hum_amp", "intensity_scale"}
        quiet = dict(p1, gain_db=-40.0)
        loud = dict(p1, gain_db=0.0)
        a = synth_respiratory_cycle(np.random.default_rng(3), 0, 1.0, 16000,
                                    hard=True, profile=quiet)
        b = synth_respiratory_cycle(np.random.default_rng(3), 0, 1.0, 16000,
                                    hard=True, profile=loud)
        assert np.abs(a).max() < 0.2 * np.abs(b).max()
