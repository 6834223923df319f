"""Native C++ WAV loader vs the pure-Python reference parser."""

import numpy as np
import pytest

from mfcc_tpu.utils import wav

native = pytest.importorskip("mfcc_tpu.native")


def _fixture(tmp_path, rng, n=6):
    paths = []
    for i in range(n):
        x = (rng.standard_normal(8000 + 777 * i) * 0.3).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        wav.write_wav(p, x, 16000)
        paths.append(p)
    return paths


def test_native_matches_python(tmp_path, rng):
    for p in _fixture(tmp_path, rng, 3):
        yn, srn = native.read_wav_native(p)
        yp, srp = wav._parse(open(p, "rb").read(), None)
        assert srn == srp
        np.testing.assert_array_equal(yn, yp)


def test_native_batch_padded(tmp_path, rng):
    paths = _fixture(tmp_path, rng)
    audio, lens, rates, errs = native.read_wavs_padded(paths, 10_000)
    assert np.all(errs == 0) and np.all(rates == 16000)
    for i, p in enumerate(paths):
        ref, _ = wav._parse(open(p, "rb").read(), None)
        L = min(len(ref), 10_000)
        assert lens[i] == L
        np.testing.assert_array_equal(audio[i, :L], ref[:L])
        assert np.all(audio[i, L:] == 0)


def test_native_quarantines_corrupt(tmp_path, rng):
    paths = _fixture(tmp_path, rng, 2)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFxxxxWAVEjunk")
    missing = str(tmp_path / "nope.wav")
    audio, lens, rates, errs = native.read_wavs_padded(
        paths + [bad, missing], 9000)
    assert np.all(errs[:2] == 0)
    assert errs[2] != 0 and errs[3] != 0          # quarantined, not fatal
    assert np.all(audio[2] == 0) and np.all(audio[3] == 0)


def test_wav_reader_uses_native_transparently(tmp_path, rng):
    x = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wav.write_wav(p, x, 16000)
    y, sr = wav.read_wav(p)     # dispatches to native when available
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)


def test_native_i16_passthrough(tmp_path, rng):
    paths = _fixture(tmp_path, rng, 3)
    ai, li, ri, ei = native.read_wavs_padded_i16(paths, 9000)
    af, lf, rf, ef = native.read_wavs_padded(paths, 9000)
    assert np.all(ei == 0) and np.array_equal(li, lf)
    np.testing.assert_allclose(ai.astype(np.float32) / 32768.0, af,
                               atol=1e-7)


def test_native_i16_rejects_non_pcm16(tmp_path, rng):
    import struct
    x = (rng.standard_normal(100) * 0.1).astype(np.float32)
    payload = x.tobytes()
    p = str(tmp_path / "f32.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 16)
                + struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    ai, li, ri, ei = native.read_wavs_padded_i16([p], 200)
    assert ei[0] == -6                 # signals: use the float path
    af, lf, rf, ef = native.read_wavs_padded([p], 200)
    assert ef[0] == 0 and lf[0] == 100  # float path handles it
