"""Native fastwav decoder vs the pure-numpy codec (bit-exactness + batch)."""

import numpy as np
import pytest

from audio_classification_icbhi_tpu import native
from audio_classification_icbhi_tpu.data.wavio import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libfastwav.so unavailable (no g++?)"
)


@pytest.mark.parametrize("dtype", ["int16", "float32"])
@pytest.mark.parametrize("channels", [1, 2])
def test_decode_matches_numpy_codec(tmp_path, rng, dtype, channels):
    x = (0.4 * rng.standard_normal((channels, 4000))).astype(np.float32)
    p = tmp_path / f"x_{dtype}_{channels}.wav"
    write_wav(p, x, 16000, dtype=dtype)
    mono, sr = native.decode_mono(p)
    ref, ref_sr = read_wav(p)
    assert sr == ref_sr == 16000
    np.testing.assert_array_equal(mono, ref.mean(axis=0).astype(np.float32))


def test_decode_batch_pad_and_crop(tmp_path, rng):
    short = (0.2 * rng.standard_normal(3000)).astype(np.float32)
    long = (0.2 * rng.standard_normal(9000)).astype(np.float32)
    write_wav(tmp_path / "short.wav", short, 16000)
    write_wav(tmp_path / "long.wav", long, 16000)
    batch, srs, lens = native.decode_batch(
        [tmp_path / "short.wav", tmp_path / "long.wav"], 6000, n_threads=2
    )
    assert batch.shape == (2, 6000)
    assert list(srs) == [16000, 16000] and list(lens) == [3000, 9000]
    assert batch[0, 3000:].sum() == 0.0  # end-pad
    # center crop: long[1500:7500]
    ref_long, _ = read_wav(tmp_path / "long.wav")
    np.testing.assert_allclose(batch[1], ref_long[0][1500:7500], atol=1e-4)


def test_truncated_fmt_chunk_is_format_error(tmp_path):
    """Regression (advisor r1): a fmt chunk shorter than 16 bytes (or an
    EXTENSIBLE one shorter than 26) previously read past the buffer; it
    must now decode as an error, not crash."""
    import struct

    short = struct.pack("<HHI", 1, 1, 16000)  # 8 of 16 required bytes
    noext = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)  # no GUID
    for name, fmt in (("shortfmt.wav", short), ("shortext.wav", noext)):
        hdr = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        hdr += b"data" + struct.pack("<I", 0)
        p = tmp_path / name
        p.write_bytes(hdr)
        assert native.decode_mono(p) is None  # clean error path
        batch, srs, lens = native.decode_batch([p], 100, n_threads=1)
        assert srs[0] < 0 and lens[0] == 0


def test_bad_file_reported_not_crashing(tmp_path):
    good = tmp_path / "good.wav"
    write_wav(good, np.zeros(100, np.float32), 8000)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage")
    batch, srs, lens = native.decode_batch([good, bad], 200, n_threads=1)
    assert srs[0] == 8000
    assert srs[1] < 0 and lens[1] == 0  # error code, zeroed row
    assert batch[1].sum() == 0.0
    assert native.decode_mono(bad) is None
