"""AM logical-channel decode: MA1/MA3 deinterleave → diversity delay →
depuncture → K=9 Viterbi → descramble (reference: src/decode.c:74-231,
439-554) as a per-frame jitted device function.

The reference's bit-plane gathers, 12-phase delay scatters and zero
insertion are all static index tables (ops/interleavers.py); the only
carried state is the 54000-bit diversity delay line per delayed stream
(ml/mu, plus eml/emu in MA3), an explicit pytree.

Unlike the reference — which decodes the buffers one frame *after*
interleaving them (src/decode.c:507-554 decodes at each bc from the buffer
filled at the previous frame's bc==7) — this decodes a frame as soon as its
interleave completes; the output bit sequence is identical, one frame
earlier.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import interleavers as IL
from nrsc5_tpu.ops.convolutional import (depuncture, viterbi_decode,
                                         viterbi_decode_chunked)
from nrsc5_tpu.ops.scramble import scrambler_keystream

DD = C.DIVERSITY_DELAY_AM  # 54000


class AMDecodeState(NamedTuple):
    ml: jax.Array  # [54000] uint8
    mu: jax.Array
    eml: jax.Array  # used in MA3 only
    emu: jax.Array


def am_decode_init_state() -> AMDecodeState:
    z = jnp.zeros(DD, jnp.uint8)
    return AMDecodeState(ml=z, mu=z, eml=z, emu=z)


@functools.lru_cache(maxsize=4)
def _phase_tables(ma3: bool):
    """Static select tables for the 12/6-phase delay recombination
    (reference: src/decode.c:143-181): for each position of p1_am / p3_am,
    which stream and which stream index supplies the bit."""
    def build(delay_map, total):
        period = sum(len(d) for d in delay_map.values())
        n_groups = total // period
        sel = np.empty(total, np.int32)
        idx = np.empty(total, np.int32)
        for s, (name, delays) in enumerate(delay_map.items()):
            k = len(delays)
            for j, d in enumerate(delays):
                pos = np.arange(n_groups) * period + d
                sel[pos] = s
                idx[pos] = np.arange(n_groups) * k + j
        return sel, idx, list(delay_map.keys())

    p1 = build({"bl": C.BL_DELAY, "ml": C.ML_DELAY,
                "bu": C.BU_DELAY, "mu": C.MU_DELAY}, 72000)
    if not ma3:
        p3 = build({"el": C.EL_DELAY, "eu": C.EU_DELAY}, 36000)
    else:
        p3 = build({"ebl": C.BL_DELAY, "eml": C.ML_DELAY,
                    "ebu": C.BU_DELAY, "emu": C.MU_DELAY}, 72000)
    return p1, p3


def _gather_stream(mats: dict, table):
    matrix, sym_idx, plane = table
    return (mats[matrix][jnp.asarray(sym_idx)] >> jnp.asarray(plane)) & 1


def _descramble_dev(bits, length):
    return bits ^ jnp.asarray(scrambler_keystream(length))


@functools.partial(jax.jit, static_argnames=("ma3",))
def am_frame_gather(pl, pu, s, t, state: AMDecodeState, ma3: bool = False):
    """Phase 1 of the AM frame decode: bit-plane gathers, the 3-frame
    diversity delay (the only frame-to-frame carried state), 12-phase
    reassembly and depuncture — everything BEFORE the Viterbis.

    Split out so fused chains can run this inside the sequential frame
    scan and flat-batch :func:`am_frame_fec` across frames/stations
    afterwards (the Viterbis have no cross-frame state; batching them
    removes per-frame sequential trellis depth and the nested-vmap
    layout penalty, see docs/PERF.md).

    Returns (p1_full [8, 3750, 3] float32 LLRs, p3_full [p3_len, 3],
    new_state)."""
    mats = {"pl": pl, "pu": pu, "s": s, "t": t}
    tabs = IL.am_ma1_tables(ma3)

    streams = {name: _gather_stream(mats, tab).astype(jnp.uint8)
               for name, tab in tabs.items()}

    # diversity delay: read the head of the line, append this frame's gather
    # (reference: src/decode.c:87,97 write at DD+n; 177-181 shift by 18000)
    def delayed(line, fresh):
        return line[:18000], jnp.concatenate([line[18000:], fresh])

    ml_now, ml_line = delayed(state.ml, streams["ml"])
    mu_now, mu_line = delayed(state.mu, streams["mu"])
    new_state = {"ml": ml_line, "mu": mu_line,
                 "eml": state.eml, "emu": state.emu}
    use = dict(streams)
    use["ml"], use["mu"] = ml_now, mu_now
    if ma3:
        eml_now, eml_line = delayed(state.eml, streams["eml"])
        emu_now, emu_line = delayed(state.emu, streams["emu"])
        new_state["eml"], new_state["emu"] = eml_line, emu_line
        use["eml"], use["emu"] = eml_now, emu_now

    (p1_sel, p1_idx, p1_names), (p3_sel, p3_idx, p3_names) = _phase_tables(ma3)
    p1_stack = jnp.stack([use[n] for n in p1_names])
    p1_am = p1_stack[jnp.asarray(p1_sel), jnp.asarray(p1_idx)]  # [72000]
    p3_stack_names = p3_names
    # el/eu have different lengths in MA1 — pad to a common length for stack
    maxlen = max(int(use[n].shape[0]) for n in p3_stack_names)
    p3_stack = jnp.stack([
        jnp.pad(use[n], (0, maxlen - use[n].shape[0])) for n in p3_stack_names])
    p3_am = p3_stack[jnp.asarray(p3_sel), jnp.asarray(p3_idx)]

    p1_llr = (p1_am.astype(jnp.float32) * 2 - 1)
    p1_full = depuncture(p1_llr.reshape(8, -1), C.PUNCTURE_E1,
                         C.P1_FRAME_LEN_AM * 3)
    p1_full = p1_full.reshape(8, C.P1_FRAME_LEN_AM, 3)

    p3_llr = (p3_am.astype(jnp.float32) * 2 - 1)
    if not ma3:
        p3_full = depuncture(p3_llr, C.PUNCTURE_E2, C.P3_FRAME_LEN_MA1 * 3)
        p3_full = p3_full.reshape(C.P3_FRAME_LEN_MA1, 3)
    else:
        p3_full = depuncture(p3_llr, C.PUNCTURE_E1, C.P3_FRAME_LEN_MA3 * 3)
        p3_full = p3_full.reshape(C.P3_FRAME_LEN_MA3, 3)
    return p1_full, p3_full, AMDecodeState(**new_state)


@functools.partial(jax.jit, static_argnames=("ma3",))
def am_frame_fec(p1_full, p3_full, ma3: bool = False):
    """Phase 2: the two chunked K=9 tail-biting Viterbis + descramble.

    p1_full [..., 8, 3750, 3] / p3_full [..., p3_len, 3]: any (equal)
    leading batch dims.  Returns (p1_bits [..., 8, 3750], p3_bits
    [..., p3_len], margins dict)."""
    # same tuning knobs as the FM path (decode_fm.p1_decode): radix-4
    # composed with fuse=8 — the round-5 trip-count finding moved the AM
    # I/Q row 911x -> 1331x (docs/PERF.md round-5 sweep)
    cpu = jax.default_backend() == "cpu"
    radix = 1 if cpu else int(os.environ.get("NRSC5_VITERBI_RADIX", "4"))
    fuse = 1 if cpu else int(os.environ.get("NRSC5_VITERBI_FUSE", "8"))
    chunk = int(os.environ.get("NRSC5_VITERBI_CHUNK_AM", "1024"))

    batch = p1_full.shape[:-3]
    p1_flat = p1_full.reshape((-1,) + p1_full.shape[-2:])
    p1_bits, p1_margin = viterbi_decode_chunked(
        p1_flat, 9, C.CONV_E1_GEN, chunk=chunk, overlap=160, radix=radix,
        fuse=fuse)
    p1_bits = jax.vmap(lambda b: _descramble_dev(b, C.P1_FRAME_LEN_AM))(
        p1_bits)
    p1_bits = p1_bits.reshape(batch + (8, C.P1_FRAME_LEN_AM))
    p1_margin = p1_margin.reshape(batch + (8,))

    gen = C.CONV_E2_E3_GEN if not ma3 else C.CONV_E1_GEN
    p3_len = C.P3_FRAME_LEN_MA1 if not ma3 else C.P3_FRAME_LEN_MA3
    p3_flat = p3_full.reshape((-1,) + p3_full.shape[-2:])
    p3_bits, p3_margin = viterbi_decode_chunked(
        p3_flat, 9, gen, chunk=chunk, overlap=160, radix=radix, fuse=fuse)
    p3_bits = jax.vmap(lambda b: _descramble_dev(b, p3_len))(p3_bits)
    p3_bits = p3_bits.reshape(batch + (p3_len,))
    p3_margin = p3_margin.reshape(batch)

    return p1_bits, p3_bits, {"p1": p1_margin, "p3": p3_margin}


@functools.partial(jax.jit, static_argnames=("ma3",))
def am_frame_decode(pl, pu, s, t, state: AMDecodeState, ma3: bool = False):
    """Decode one full AM frame (8 blocks of accumulated hard symbols) —
    :func:`am_frame_gather` + :func:`am_frame_fec` composed.

    pl/pu/s/t: [8*32*25] uint8 QAM symbol matrices (block-major).
    Returns (p1_bits [8, 3750] uint8, p3_bits [frame_len] uint8,
             margins dict, new_state).
    """
    p1_full, p3_full, new_state = am_frame_gather(pl, pu, s, t, state, ma3)
    p1_bits, p3_bits, margins = am_frame_fec(p1_full, p3_full, ma3)
    return p1_bits, p3_bits, margins, new_state


@jax.jit
def am_pids_decode(pids_syms, pids1_disabled: jax.Array):
    """AM PIDS decode for one block.

    pids_syms: [32, 2] uint8 QAM16 codes (inner, outer).
    pids1_disabled: bool — MA1 with rdbi set zeroes the lower stream
    (reference: src/decode.c:474-505).
    Returns bits [80] uint8.
    """
    il_row, il_p, iu_row, iu_p, il_delay, iu_delay = IL.am_pids_tables()
    il = (pids_syms[jnp.asarray(il_row), 0] >> jnp.asarray(il_p)) & 1
    iu = (pids_syms[jnp.asarray(iu_row), 1] >> jnp.asarray(iu_p)) & 1

    llr = jnp.zeros(240, jnp.float32)
    i = jnp.arange(120)
    pos_il = (i // 12) * 24 + jnp.asarray(il_delay)[i % 12]
    pos_iu = (i // 12) * 24 + jnp.asarray(iu_delay)[i % 12]
    il_val = jnp.where(pids1_disabled, 0.0,
                       il.astype(jnp.float32) * 2 - 1)
    llr = llr.at[pos_il].set(il_val)
    llr = llr.at[pos_iu].set(iu.astype(jnp.float32) * 2 - 1)

    # unpunctured rate-1/3: 240 soft bits = 80 trellis steps x 3
    full = llr.reshape(C.PIDS_FRAME_LEN, 3)
    bits, _ = viterbi_decode(full, 9, C.CONV_E2_E3_GEN)
    return _descramble_dev(bits, C.PIDS_FRAME_LEN)
