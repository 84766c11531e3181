"""Device-side bit packing for decoded-frame outputs.

The accelerator in this environment transfers every jit-program output
back to the host eagerly over a ~50 MB/s tunnel (measured: returning an
unpacked [16, 146176] uint8 P1 batch costs ~45 ms/call; the same data
packed 8x costs ~7 ms).  Decoded frames are bits-as-bytes, so packing
them 8-to-a-byte on device before the program boundary recovers nearly
all of that.  Host-side unpacking is `np.unpackbits` (GB/s).

Little-endian bit order within each byte, matching
``np.unpackbits(..., bitorder="little")``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SHIFTS = np.arange(8, dtype=np.uint8)


def pack_bits(bits):
    """[..., T] uint8 bits (T % 8 == 0) -> [..., T//8] uint8 bytes."""
    t = bits.shape[-1]
    assert t % 8 == 0, t
    return (bits.reshape(bits.shape[:-1] + (t // 8, 8))
            << jnp.asarray(_SHIFTS)).sum(-1).astype(jnp.uint8)


def unpack_bits(packed: np.ndarray) -> np.ndarray:
    """Host inverse: [..., T//8] uint8 bytes -> [..., T] uint8 bits."""
    return np.unpackbits(np.asarray(packed), axis=-1, bitorder="little")


PACKED_KEYS = ("p1", "px1", "px2", "p3", "pids")


def pack_out(out: dict) -> dict:
    """Pack the large decoded-bit entries of a chain output dict."""
    for k in PACKED_KEYS:
        if k in out:
            out[k] = pack_bits(out[k])
    return out


def unpack_out(out: dict) -> dict:
    """Host inverse of :func:`pack_out` (operates on fetched numpy)."""
    for k in PACKED_KEYS:
        if k in out:
            out[k] = unpack_bits(out[k])
    return out
