"""ctypes bindings for the native host-side components (native/wavio.cpp).

pybind11 isn't in this image, so the boundary is a plain C ABI + ctypes.
The library is built by ``native/Makefile``; if the .so is missing and a
compiler is available it is built lazily on first use (cached thereafter).
Callers must treat this module as optional: utils/wav.py falls back to the
pure-Python parser whenever import or build fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmfccwavio.so")
_SRC_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))

_ERRORS = {
    -1: "io error",
    -2: "not a RIFF/WAVE file",
    -3: "missing fmt or data chunk",
    -4: "unsupported encoding",
    -5: "out of memory",
}


def _build() -> None:
    subprocess.run(["make", "-C", _SRC_DIR], check=True,
                   capture_output=True, timeout=300)


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.mfcc_read_wav.restype = ctypes.c_int
    lib.mfcc_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    lib.mfcc_free.restype = None
    lib.mfcc_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.mfcc_read_wavs.restype = None
    lib.mfcc_read_wavs.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.mfcc_read_wavs_i16.restype = None
    lib.mfcc_read_wavs_i16.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    return lib


_LIB = _load()


def read_wav_native(path: str, channel: int = -1):
    """Decode one WAV -> (float32 mono ndarray, sample_rate).

    channel=-1 averages channels; >=0 selects one.  Raises on bad files
    (utils/wav.py maps this to WavError handling/fallback).
    """
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = _LIB.mfcc_read_wav(os.fsencode(path), channel,
                            ctypes.byref(out), ctypes.byref(n),
                            ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"wav decode failed: {_ERRORS.get(rc, rc)} ({path})")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        _LIB.mfcc_free(out)
    return arr, int(sr.value)


def read_wavs_padded(paths: list[str], max_len: int, channel: int = -1,
                     n_threads: int = 0):
    """Thread-pooled batch decode into a padded (B, max_len) matrix.

    Returns (audio (B, max_len) f32, lengths (B,) i64, rates (B,) i32,
    errors (B,) i32).  Failed files have errors[i] != 0 and a zeroed row —
    the per-utterance quarantine contract (SURVEY.md §5): the batch
    survives individual corrupt inputs.
    """
    B = len(paths)
    audio = np.zeros((B, max_len), np.float32)
    lengths = np.zeros((B,), np.int64)
    rates = np.zeros((B,), np.int32)
    errors = np.zeros((B,), np.int32)
    arr = (ctypes.c_char_p * B)(*[os.fsencode(p) for p in paths])
    _LIB.mfcc_read_wavs(
        arr, B, channel,
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return audio, lengths, rates, errors


def read_wavs_padded_i16(paths: list[str], max_len: int, n_threads: int = 0):
    """PCM16 passthrough batch decode -> (B, max_len) int16 (raw samples).

    Half the bytes of the float path — the pipeline casts on-device
    (models accept int16).  Files that are not mono 16-bit integer PCM get
    error -6; the caller decodes those via read_wavs_padded instead.
    """
    B = len(paths)
    audio = np.zeros((B, max_len), np.int16)
    lengths = np.zeros((B,), np.int64)
    rates = np.zeros((B,), np.int32)
    errors = np.zeros((B,), np.int32)
    arr = (ctypes.c_char_p * B)(*[os.fsencode(p) for p in paths])
    _LIB.mfcc_read_wavs_i16(
        arr, B,
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return audio, lengths, rates, errors
