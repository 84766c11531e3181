"""FM logical-channel decode: deinterleave -> depuncture -> Viterbi ->
descramble, as fused jitted device functions (reference: src/decode.c:378-472).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import interleavers as IL
from nrsc5_tpu.ops.convolutional import (depuncture, reencode_bit_errors,
                                         viterbi_decode,
                                         viterbi_decode_chunked)
from nrsc5_tpu.ops.scramble import scrambler_keystream


def _descramble_dev(bits, length):
    return bits ^ jnp.asarray(scrambler_keystream(length))


def _p1_deinterleave_mxu(pm_matrix):
    """Interleaver-I deinterleave as two one-hot matmuls (MXU path).

    The 365440-entry gather factors into structured permutations (see
    interleavers.p1_fm_structured); expressing the row/column selections as
    one-hot bf16 matmuls moves the work from the scatter/gather unit onto
    the systolic array.  Exact: each output is a single 1.0*x product (LLR
    magnitudes < 256 are exact in bf16).
    """
    pq, pbp = IL.p1_fm_onehots()
    # exact in any dtype (each output is one 1.0*x product; LLR magnitudes
    # < 256 are exact in bf16); XLA:CPU lacks bf16 dot, so gate by backend
    dt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    m2 = (pm_matrix.reshape(16, 32, 20, 36)
          .transpose(0, 2, 1, 3).reshape(320, 1152))
    ms = jnp.dot(
        jnp.dot(jnp.asarray(pbp, dt), m2.astype(dt),
                preferred_element_type=jnp.float32).astype(dt),
        jnp.asarray(pq, dt),
        preferred_element_type=jnp.float32)          # [(r,p')=320, q=1142]
    return ms.T.reshape(C.P1_FRAME_LEN_ENCODED_FM)   # i = q*320 + r*20 + p'


@functools.partial(jax.jit, static_argnames=("chunked",))
def p1_decode(pm_matrix, chunked: bool = False):
    """pm_matrix: [16*32*720] int8 (one P1 frame of soft bits).
    Returns (bits [146176] uint8, viterbi margin).

    ``chunked=True`` selects the chunk-parallel Viterbi (throughput path;
    bit-identical with overwhelming probability, see viterbi_decode_chunked).
    """
    # A/B on TPU v5e (32 stations): gather 359.7x vs one-hot matmul 340.2x
    # real time — the int8 gather wins (tiny-M batched matmuls underutilize
    # the MXU), so it is the default; NRSC5_DEINT_MXU=1 opts into the
    # matmul formulation (bit-exact, see test_interleavers).
    if os.environ.get("NRSC5_DEINT_MXU") == "1":
        llr = _p1_deinterleave_mxu(pm_matrix)
    else:
        llr = pm_matrix[jnp.asarray(IL.p1_fm_table())].astype(jnp.float32)
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, C.P1_FRAME_LEN_FM * 3)
    full = full.reshape(C.P1_FRAME_LEN_FM, 3)
    if chunked:
        # Default ACS on TPU is radix-4 (2 trellis steps / scan step)
        # COMPOSED with fuse=8 (8 radix super-steps per scan iteration —
        # bit-identical to the unfused radix recursion) at chunk 1152:
        # the round-5 honest compute row (bench.py --mode compute, which
        # forces the traceback a margin-only ablation lets XLA dead-code
        # -eliminate) proved the chain TRIP-COUNT-bound, and cutting the
        # ACS+traceback scan trips 304 -> 42 moved the headline 917x ->
        # 1676x (sweep table in docs/PERF.md round-5; chunk 1024/1088
        # sit in an XLA layout-cliff window — 1152-1280 is the fast
        # plateau).  Radix-1 fused-8 remains the strictly-bit-identical
        # opt-out (NRSC5_VITERBI_RADIX=1: the radix path can flip float
        # near-ties, ~1/20k bits at 3 dB, none at operating SNR).
        cpu = jax.default_backend() == "cpu"
        radix = 1 if cpu else int(os.environ.get("NRSC5_VITERBI_RADIX", "4"))
        fuse = 1 if cpu else int(os.environ.get("NRSC5_VITERBI_FUSE", "8"))
        chunk = int(os.environ.get("NRSC5_VITERBI_CHUNK", "1152"))
        unroll = int(os.environ.get("NRSC5_VITERBI_UNROLL", "2"))
        bits, margin = viterbi_decode_chunked(full, 7, C.CONV_K7_GEN,
                                              chunk=chunk, radix=radix,
                                              unroll=unroll, fuse=fuse)
    else:
        bits, margin = viterbi_decode(full, 7, C.CONV_K7_GEN)
    errors = reencode_bit_errors(full, bits, 7, C.CONV_K7_GEN,
                                 C.PUNCTURE_P1_PIDS_FM)
    return _descramble_dev(bits, C.P1_FRAME_LEN_FM), margin, errors


@jax.jit
def pids_decode(pm_block):
    """pm_block: [32*720] int8 (one L1 block).  Returns bits [80] uint8."""
    llr = pm_block[jnp.asarray(IL.pids_fm_table())].astype(jnp.float32)
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, C.PIDS_FRAME_LEN * 3)
    full = full.reshape(C.PIDS_FRAME_LEN, 3)
    bits, _ = viterbi_decode(full, 7, C.CONV_K7_GEN)
    return _descramble_dev(bits, C.PIDS_FRAME_LEN)


@functools.partial(jax.jit, static_argnames=("frame_len",))
def px_iv_call(internal, new_llrs, call_phase, frame_len: int):
    """One interleaver-IV call: deinterleave + state update only (the
    part that genuinely carries state pair-to-pair; the Viterbi is
    stateless across calls and is flat-batched by the fused chains —
    see :func:`px_fec`).

    Returns (full [frame_len, 3] float32 depunctured LLRs,
             new_internal [N])."""
    read_idx, n, calls = IL.p3_iv_tables(frame_len)
    hazard = IL.p3_iv_hazard(frame_len)
    call_len = 2 * frame_len
    offset = call_phase * call_len

    r = jax.lax.dynamic_slice(jnp.asarray(read_idx), (offset,), (call_len,))
    hz = jax.lax.dynamic_slice(jnp.asarray(hazard), (offset,), (call_len,))
    vals = internal[r]
    fresh = new_llrs[jnp.clip(r - offset, 0, call_len - 1)]
    llr = jnp.where(hz, fresh, vals).astype(jnp.float32)

    full = depuncture(llr, C.PUNCTURE_P3_P4_FM, frame_len * 3)
    full = full.reshape(frame_len, 3)
    new_internal = jax.lax.dynamic_update_slice(internal, new_llrs, (offset,))
    return full, new_internal


def px_fec(full, frame_len: int):
    """P3/P4 K=7 decode of interleaver-IV output LLRs.

    full: [..., frame_len, 3] with any leading batch dims (flattened
    into one batch internally — nested vmap layouts are slower on TPU).
    Returns (bits [..., frame_len] uint8, margin [...]).  (A/B on v5e:
    the chunk-parallel variant measures the same here — the station ×
    pair batch already fills the machine — so the exact sequential
    decoder stays.)"""
    batch = full.shape[:-2]
    flat = full.reshape((-1,) + full.shape[-2:])
    bits, margin = viterbi_decode(flat, 7, C.CONV_K7_GEN)
    bits = jax.vmap(lambda b: _descramble_dev(b, frame_len))(bits)
    return bits.reshape(batch + (frame_len,)), margin.reshape(batch)


@functools.partial(jax.jit, static_argnames=("frame_len",))
def px_decode(internal, new_llrs, call_phase, frame_len: int):
    """One interleaver-IV call + P3/P4 decode (:func:`px_iv_call` +
    :func:`px_fec` composed — the per-pair streaming entry point).

    internal: [N] int8 carried interleaver state.
    new_llrs: [2*frame_len] int8 soft bits from two L1 blocks.
    call_phase: int32 in [0, calls_per_cycle).
    Returns (bits [frame_len] uint8, margin, new_internal [N]).
    """
    full, new_internal = px_iv_call(internal, new_llrs, call_phase,
                                    frame_len)
    bits, margin = px_fec(full[None], frame_len)
    return bits[0], margin[0], new_internal
