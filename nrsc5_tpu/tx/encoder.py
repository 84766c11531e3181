"""NRSC-5 FM L1/L2 encoder: bits -> PM soft-bit matrix (truth harness).

Inverse of the receive chain decode path (reference: src/decode.c:451-472):
scramble -> tail-biting conv encode -> puncture -> interleave into the PM
matrix, plus interleaver-IV cycles for P3/P4.
"""

from __future__ import annotations

import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import interleavers as IL
from nrsc5_tpu.ops.convolutional import conv_encode, puncture
from nrsc5_tpu.ops.scramble import scramble


def encode_p1_stream(p1_bits: np.ndarray) -> np.ndarray:
    """146176 P1 bits -> 365440-bit punctured stream."""
    assert p1_bits.shape[-1] == C.P1_FRAME_LEN_FM
    scr = scramble(p1_bits.astype(np.uint8))
    coded = conv_encode(scr, 7, C.CONV_K7_GEN)
    return puncture(coded, C.PUNCTURE_P1_PIDS_FM)


def encode_pids_stream(pids_bits: np.ndarray) -> np.ndarray:
    """[..., 80] PIDS bits -> [..., 200] punctured stream."""
    assert pids_bits.shape[-1] == C.PIDS_FRAME_LEN
    scr = scramble(pids_bits.astype(np.uint8))
    coded = conv_encode(scr, 7, C.CONV_K7_GEN)
    return puncture(coded, C.PUNCTURE_P1_PIDS_FM)


def build_pm_matrix(p1_bits: np.ndarray, pids_bits: np.ndarray) -> np.ndarray:
    """Assemble one P1 frame's PM matrix of TX signs.

    p1_bits: [146176]; pids_bits: [16, 80].
    Returns int8 [512, 720] in {-1,+1} (demod order).
    """
    p1 = encode_p1_stream(p1_bits)
    pids = encode_pids_stream(pids_bits).reshape(-1)
    stream = np.concatenate([p1, pids]).astype(np.int8)
    matrix = stream[IL.pm_inverse_table()]
    return (matrix.astype(np.int8) * 2 - 1).reshape(IL.PM_ROWS, IL.PM_ROW)


def encode_p3_stream(p3_bits: np.ndarray, frame_len: int) -> np.ndarray:
    """One P3/P4 frame -> punctured rate-1/2 stream of 2*frame_len bits."""
    assert p3_bits.shape[-1] == frame_len
    scr = scramble(p3_bits.astype(np.uint8))
    coded = conv_encode(scr, 7, C.CONV_K7_GEN)
    return puncture(coded, C.PUNCTURE_P3_P4_FM)


def build_px_matrix(frames: np.ndarray, frame_len: int) -> np.ndarray:
    """Interleaver-IV cycle: 16 P3/P4 frames -> TX sign stream.

    frames: [16, frame_len] bits.  Returns int8 [N] in {-1,+1}, the sideband
    soft-bit stream in demod order for 32 L1 blocks (one cycle).  The
    receiver outputs these frames one full cycle later.
    """
    streams = np.stack([encode_p3_stream(f, frame_len) for f in frames])
    cycle = streams.reshape(-1).astype(np.int8)
    inv = IL.p3_iv_inverse(frame_len)
    return (cycle[inv] * 2 - 1).astype(np.int8)
