"""External AAC decode oracle: ctypes binding to the libavcodec shim.

Decodes the standard AAC-LC / HE-AAC ADTS stream emitted by
tx/hdc_encoder.HDCEncoder.encode_frame_dual() with ffmpeg's independent
decoder, giving the clean-room HDC codec a PCM oracle that is NOT this
repo's own code (reference analog: patched FAAD2, src/output.c:126-163).

Build is lazy (same pattern as nrsc5_tpu/native/__init__.py) and gated:
``available()`` is False when libavcodec or a compiler is missing, and
tests skip cleanly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_lib = None
_build_error: str | None = None


def _build_dir() -> str:
    d = os.path.join(tempfile.gettempdir(), "nrsc5_tpu_native")
    os.makedirs(d, exist_ok=True)
    return d


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "aac_oracle.cpp")


def _build() -> str | None:
    src = _source_path()
    out = os.path.join(_build_dir(), "aac_oracle.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    for cc in ("c++", "g++"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", src,
                 "-lavcodec", "-lavutil", "-o", out],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return out
            global _build_error
            _build_error = r.stderr.decode(errors="replace")[-500:]
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def _get() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.aac_oracle_decode.restype = ctypes.c_longlong
    lib.aac_oracle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return _get() is not None


def decode_adts(stream: bytes) -> tuple[np.ndarray, int]:
    """Decode a whole ADTS stream -> (pcm[n, nch] float32, sample_rate).

    PCM is in libavcodec's native [-1, 1] float scale."""
    lib = _get()
    if lib is None:
        raise RuntimeError(f"aac oracle unavailable: {_build_error}")
    # generous bound: HE-AAC doubles the core rate (2048/frame); ADTS
    # frames are >= 9 bytes, so streams can't have more frames than len/9
    max_frames = len(stream) // 9 + 16
    cap = max_frames * 2048 * 2 + 4096
    out = np.empty(cap, np.float32)
    nch = ctypes.c_int(0)
    rate = ctypes.c_int(0)
    n = lib.aac_oracle_decode(
        stream, len(stream),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(nch), ctypes.byref(rate))
    if n < 0:
        raise RuntimeError(f"aac oracle decode failed: {n}")
    if nch.value == 0:
        return np.zeros((0, 1), np.float32), 0
    return out[:n * nch.value].reshape(-1, nch.value).copy(), rate.value
