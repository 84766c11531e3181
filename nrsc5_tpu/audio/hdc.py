"""HDC (HDC-AAC) → PCM decode.

HDC is a nonstandard AAC variant: an AAC-LC core with a modified SBR
(32 subsamples), fed as raw packets without ADTS framing.  The reference
uses a patched FAAD2 (`NeAACDecInitHDC`; reference:
support/faad2-hdc-support.patch, src/output.c:126-163).

This environment has no network access and no FAAD2 sources, so the
framework's primary correctness boundary is **bit-exact HDC packets**
(SURVEY.md §2, external-dependency table); PCM is produced when a decoder
backend is available:

  * ``libfaad_hdc.so`` (a FAAD2 build with the HDC patch) found via
    NRSC5_TPU_FAAD_HDC or on the default library path — bound with ctypes.
  * otherwise :class:`HDCDecoder.check` raises and audio output is
    disabled (HDC events still carry the exact packets).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

import numpy as np


class _NeAACDecFrameInfo(ctypes.Structure):
    """Full NeAACDecFrameInfo layout (faad2 include/neaacdec.h struct
    NeAACDecFrameInfo) — the library memsets/writes the whole struct, so
    the binding must declare every field."""
    _fields_ = [("bytesconsumed", ctypes.c_ulong),
                ("samples", ctypes.c_ulong),
                ("channels", ctypes.c_ubyte),
                ("error", ctypes.c_ubyte),
                ("samplerate", ctypes.c_ulong),
                ("sbr", ctypes.c_ubyte),
                ("object_type", ctypes.c_ubyte),
                ("header_type", ctypes.c_ubyte),
                ("num_front_channels", ctypes.c_ubyte),
                ("num_side_channels", ctypes.c_ubyte),
                ("num_back_channels", ctypes.c_ubyte),
                ("num_lfe_channels", ctypes.c_ubyte),
                ("channel_position", ctypes.c_ubyte * 64),
                ("ps", ctypes.c_ubyte)]


class _FaadHDC:
    """ctypes binding of the patched FAAD2 HDC entry points
    (reference: support/faad2-hdc-support.patch:186-214 —
    ``NeAACDecInitHDC(NeAACDecHandle*)`` takes only the handle)."""

    def __init__(self, path: str):
        lib = ctypes.CDLL(path)
        lib.NeAACDecOpen.restype = ctypes.c_void_p
        lib.NeAACDecInitHDC.restype = ctypes.c_char
        lib.NeAACDecInitHDC.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
        lib.NeAACDecDecode.restype = ctypes.c_void_p
        lib.NeAACDecDecode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(_NeAACDecFrameInfo),
            ctypes.c_char_p, ctypes.c_ulong]
        self.lib = lib
        # InitHDC closes+reopens the handle internally; seed it with one.
        self.handle = ctypes.c_void_p(lib.NeAACDecOpen())
        lib.NeAACDecInitHDC(ctypes.byref(self.handle))

    def decode(self, packet: bytes) -> np.ndarray | None:
        info = _NeAACDecFrameInfo()
        ptr = self.lib.NeAACDecDecode(self.handle, ctypes.byref(info),
                                      packet, len(packet))
        if not ptr or info.error or info.samples == 0:
            return None
        buf = ctypes.cast(ptr, ctypes.POINTER(
            ctypes.c_int16 * info.samples))
        return np.ctypeslib.as_array(buf.contents).copy()


_lib_path_cache: str | None | bool = False  # False = not probed yet


def _find_library() -> str | None:
    global _lib_path_cache
    if _lib_path_cache is not False:
        return _lib_path_cache
    candidates = []
    env = os.environ.get("NRSC5_TPU_FAAD_HDC")
    if env:
        candidates.append(env)
    found = ctypes.util.find_library("faad_hdc")
    if found:
        candidates.append(found)
    for cand in candidates:
        if os.path.exists(cand) or "/" not in cand:
            _lib_path_cache = cand
            return cand
    _lib_path_cache = None
    return None


class HDCDecoder:
    """Per-program HDC decoder (factory signature used by Output)."""

    @staticmethod
    def check():
        if _find_library() is None:
            raise RuntimeError(
                "no HDC decoder backend: set NRSC5_TPU_FAAD_HDC to a "
                "faad2-hdc build of libfaad (see reference "
                "support/faad2-hdc-support.patch)")

    def __init__(self):
        path = _find_library()
        if path is None:
            raise RuntimeError("no HDC decoder backend")
        self._dec = _FaadHDC(path)

    def decode(self, packet: bytes):
        return self._dec.decode(packet)
