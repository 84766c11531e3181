"""NRSC-5 scrambler / descrambler.

The standard scrambles every logical channel with an 11-bit LFSR seeded with
0x3ff (feedback ``((v >> 9) ^ v) & 1``; reference: src/decode.c:279-294).
Because the seed is fixed, the keystream is a constant bit sequence: on TPU
(de)scrambling is a single XOR against a precomputed constant — no sequential
work at all, and it batches trivially over stations/frames.
"""

from __future__ import annotations

import functools

import numpy as np

from nrsc5_tpu.constants import SCRAMBLER_SEED


@functools.lru_cache(maxsize=8)
def scrambler_keystream(length: int) -> np.ndarray:
    """First ``length`` bits of the NRSC-5 scrambler keystream (uint8)."""
    out = np.empty(length, dtype=np.uint8)
    val = SCRAMBLER_SEED
    for i in range(length):
        bit = ((val >> 9) ^ val) & 1
        val |= bit << 11
        val >>= 1
        out[i] = bit
    out.setflags(write=False)
    return out


def descramble(bits, length: int | None = None):
    """XOR a bit array (any leading batch dims, last dim = frame bits) with
    the keystream.  Works on numpy and jax arrays alike."""
    n = bits.shape[-1] if length is None else length
    ks = scrambler_keystream(n)
    return bits ^ ks


# scrambling is its own inverse
scramble = descramble
