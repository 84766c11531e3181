"""Native host-transport kernels: lazy cc build + ctypes binding.

``get_lib()`` returns the loaded library or ``None`` (pure-Python fallback
paths stay available).  The shared object is built once into
``~/.cache/nrsc5_tpu`` (or $NRSC5_TPU_NATIVE_DIR) from host_ops.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = False  # False = not probed


def _build_dir() -> str:
    d = os.environ.get("NRSC5_TPU_NATIVE_DIR",
                       os.path.expanduser("~/.cache/nrsc5_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "host_ops.cpp")


def build(force: bool = False) -> str | None:
    """Compile host_ops.cpp; returns the .so path or None on failure."""
    src = _source_path()
    out = os.path.join(_build_dir(), "libnrsc5host.so")
    if not force and os.path.exists(out) \
            and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    for cc in ("c++", "g++", "cc"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", src, "-o", out],
                check=True, capture_output=True, timeout=120)
            return out
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not False:  # write-once: lock-free fast path for hot calls
        return _lib
    with _lock:
        if _lib is not False:
            return _lib
        path = build()
        if path is None:
            _lib = None
            return None
        try:
            lib = ctypes.CDLL(path)
            _bind(lib)
        except AttributeError:
            # a stale cached .so missing a newer symbol (e.g. copied with
            # preserved mtimes): rebuild once, else pure-Python fallback
            try:
                path = build(force=True)
                lib = ctypes.CDLL(path) if path else None
                if lib is not None:
                    _bind(lib)
            except (OSError, AttributeError):
                lib = None
        except OSError:
            lib = None
        _lib = lib
        return lib


def _bind(lib):
    lib.nrsc5_crc8.restype = ctypes.c_uint8
    lib.nrsc5_crc8.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.nrsc5_fcs16.restype = ctypes.c_uint16
    lib.nrsc5_fcs16.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.nrsc5_hdlc_unescape.restype = ctypes.c_size_t
    lib.nrsc5_hdlc_unescape.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
    lib.nrsc5_aas_frame.restype = ctypes.c_size_t
    lib.nrsc5_aas_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
    lib.nrsc5_hdlc_split.restype = ctypes.c_int
    lib.nrsc5_hdlc_split.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.nrsc5_gather_pack.restype = None
    lib.nrsc5_gather_pack.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.nrsc5_rs_decode_pdu.restype = None
    lib.nrsc5_rs_decode_pdu.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
    lib.nrsc5_hdc_spectral.restype = ctypes.c_long
    lib.nrsc5_hdc_spectral.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_void_p]
    lib.nrsc5_hdc_register_book.restype = None
    lib.nrsc5_hdc_register_book.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.nrsc5_hdc_ics.restype = ctypes.c_long
    lib.nrsc5_hdc_ics.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]


def crc8(data: bytes) -> int:
    lib = get_lib()
    if lib is None:
        from nrsc5_tpu.utils import crc as pycrc
        return pycrc.crc8(data)
    return lib.nrsc5_crc8(bytes(data), len(data))


def gather_pack(bits, idx):
    """np.packbits(bits[idx]) through the native kernel; returns None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np

    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    n = idx.shape[0]
    out = np.empty((n + 7) // 8, np.uint8)
    lib.nrsc5_gather_pack(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def rs_decode_pdu(buf96):
    """Native shortened-RS(255,247) decode of [..., 96] uint8 codewords;
    returns (corrected, ok, n_corrected) like ops.rs.rs_decode_pdu, or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(buf96, dtype=np.uint8))
    shape = arr.shape
    flat = arr.reshape(-1, 96).copy()
    n = flat.shape[0]
    ok = np.zeros(n, np.uint8)
    ncorr = np.zeros(n, np.int32)
    lib.nrsc5_rs_decode_pdu(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ncorr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return (flat.reshape(shape), ok.astype(bool).reshape(shape[:-1]),
            ncorr.astype(np.int64).reshape(shape[:-1]))


_hdc_luts = None


def _build_hdc_luts():
    import numpy as np

    from nrsc5_tpu.audio import aac_core as A
    from nrsc5_tpu.audio import aac_tables as T

    luts = {}
    for cb in range(1, 12):
        codes = np.asarray(getattr(T, f"CODES{cb}"), np.uint32)
        bits = np.asarray(getattr(T, f"BITS{cb}"), np.uint8)
        width = int(bits.max())
        sym = np.full(1 << width, -1, np.int16)
        ln = np.zeros(1 << width, np.uint8)
        for s, (c, b) in enumerate(zip(codes.tolist(), bits.tolist())):
            if b == 0:
                continue
            base = c << (width - b)
            sym[base: base + (1 << (width - b))] = s
            ln[base: base + (1 << (width - b))] = b
        dim, _lav, signed_ = A.CB_META[cb]
        tuples = np.asarray([A.unpack_index(cb, i)
                             for i in range(len(codes))], np.int16)
        sym, ln, tuples = (np.ascontiguousarray(sym),
                           np.ascontiguousarray(ln),
                           np.ascontiguousarray(tuples))
        # keep the arrays alive alongside their raw pointers (computing
        # data_as per call dominates the per-band dispatch cost)
        luts[cb] = ((sym, ln, tuples), sym.ctypes.data, ln.ctypes.data,
                    width, tuples.ctypes.data, dim,
                    int(signed_), int(cb == A.ESC_HCB))
    return luts


_hdc_sf_lut = None
_hdc_books_lib = None


def _ensure_books(lib):
    """Register every spectral codebook + the scalefactor book with the
    native library once (slot 12 = the reserved spectral id, reused for
    the SF book)."""
    global _hdc_luts, _hdc_sf_lut, _hdc_books_lib
    if _hdc_books_lib is lib:
        return
    import numpy as np

    if _hdc_luts is None:
        _hdc_luts = _build_hdc_luts()
    for cb, (_keep, sym_p, ln_p, width, tup_p, dim, signed_, esc) \
            in _hdc_luts.items():
        lib.nrsc5_hdc_register_book(cb, sym_p, ln_p, width, tup_p, dim,
                                    signed_, esc)
    if _hdc_sf_lut is None:
        from nrsc5_tpu.audio import aac_tables as T
        codes = np.asarray(T.FF_AAC_SCALEFACTOR_CODE, np.uint32)
        bits = np.asarray(T.FF_AAC_SCALEFACTOR_BITS, np.uint8)
        width = int(bits.max())
        sym = np.full(1 << width, -1, np.int16)
        ln = np.zeros(1 << width, np.uint8)
        for s, (c, b) in enumerate(zip(codes.tolist(), bits.tolist())):
            if b == 0:
                continue
            base = c << (width - b)
            sym[base: base + (1 << (width - b))] = s
            ln[base: base + (1 << (width - b))] = b
        sym, ln = np.ascontiguousarray(sym), np.ascontiguousarray(ln)
        _hdc_sf_lut = (sym, ln, width)
    sym, ln, width = _hdc_sf_lut
    lib.nrsc5_hdc_register_book(12, sym.ctypes.data, ln.ctypes.data, width,
                                None, 1, 0, 0)
    _hdc_books_lib = lib


def hdc_ics(data: bytes, pos: int, short: bool, max_sfb: int,
            group_len, swb_offset):
    """Parse one channel's full individual stream natively: global gain
    (8 bits) + section data + scale factors + spectral huffman, in ONE
    call (the per-section hdc_spectral dispatch was ~25% of the host
    parse wall).  Returns (sfb_cb [G, max_sfb] int32, scale_factors
    [G, max_sfb] int32, quant [1024] int32, new bit position), or None
    when the native library is unavailable.  Raises ValueError exactly
    where the pure-Python parser raises (differentially pinned)."""
    lib = get_lib()
    if lib is None:
        return None
    _ensure_books(lib)
    import numpy as np

    num_groups = len(group_len)
    gl = np.ascontiguousarray(group_len, dtype=np.int32)
    offs = np.ascontiguousarray(np.asarray(swb_offset)[:max_sfb + 1],
                                dtype=np.int16)
    sfb_cb = np.zeros((num_groups, max_sfb), np.int32)
    sf = np.zeros((num_groups, max_sfb), np.int32)
    quant = np.zeros(1024, np.int32)
    new_pos = lib.nrsc5_hdc_ics(
        data, len(data), pos, int(bool(short)), max_sfb, num_groups,
        gl.ctypes.data, offs.ctypes.data,
        sfb_cb.ctypes.data, sf.ctypes.data, quant.ctypes.data)
    if new_pos < 0:
        raise ValueError("invalid ICS bitstream")
    return sfb_cb, sf, quant, int(new_pos)


def hdc_spectral(data: bytes, pos: int, cb: int, n: int):
    """Decode ``n`` spectral values of codebook ``cb`` starting at bit
    ``pos`` of ``data``; returns (int32 values, new bit position), or
    None when the native library is unavailable.  Raises ValueError on a
    corrupt codeword/escape (mirrors the pure-Python parser)."""
    lib = get_lib()
    if lib is None:
        return None
    global _hdc_luts
    if _hdc_luts is None:
        _hdc_luts = _build_hdc_luts()
    import numpy as np

    _keep, sym_p, ln_p, width, tup_p, dim, signed_, esc = _hdc_luts[cb]
    out = np.empty(n, np.int32)
    new_pos = lib.nrsc5_hdc_spectral(
        data, len(data), pos, sym_p, ln_p, width, tup_p, dim,
        signed_, esc, n, out.ctypes.data)
    if new_pos < 0:
        raise ValueError("invalid huffman codeword")
    return out, int(new_pos)


def aas_frame(data: bytes) -> bytes | None:
    """Unescape + FCS16 + protocol filter; returns the 0x21 payload
    (without protocol byte and FCS) or None."""
    lib = get_lib()
    if lib is None:
        from nrsc5_tpu.transport.frame import unescape_hdlc
        from nrsc5_tpu.utils.crc import VALIDFCS16, fcs16
        payload = unescape_hdlc(data)
        if len(payload) < 4 or fcs16(payload) != VALIDFCS16 \
                or payload[0] != 0x21:
            return None
        return payload[1:-2]
    out = ctypes.create_string_buffer(max(len(data), 1))
    n = lib.nrsc5_aas_frame(bytes(data), len(data), out)
    if n == 0:
        return None
    return out.raw[1:n]
