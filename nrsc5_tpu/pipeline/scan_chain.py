"""Fused steady-state FM receive chain: one jitted scan over L1 blocks.

The host driver (:mod:`nrsc5_tpu.pipeline.receiver`) performs one device
round-trip per 92.88 ms block — correct, but latency-bound.  Once a station
is FINE-synced its per-block control flow is fixed, so the whole chain
(acquire derotation/fold/FFT → Costas tracking → equalize → soft demap →
deinterleave → Viterbi → descramble) becomes a single pure function over a
long sample stream:

    samples[T] --lax.scan over blocks--> pm[B, 23040] --batched FEC-->
        p1 bits [F, 146176], pids bits [B, 80]

with the carried state (sample offset, acquire phase, Costas phase/freq and
timing feedback) an explicit pytree.  ``vmap`` over a leading station axis
gives the multi-station batch (BASELINE config 4); `shard_map` over a
(station, time) mesh rides on top (see nrsc5_tpu.parallel).

The variable per-block sample consumption of the reference
(src/acquire.c:259-262: ``keep = fftcp·3/2 − samperr``) is re-expressed as a
bounded offset walk inside a fixed-size buffer: in FINE state the block
consumes ``32·FFTCP + samperr_fb`` samples where ``samperr_fb`` is the
previous block's clock-error estimate (a few samples), so the caller
provides ``slack`` extra samples of headroom.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops.acquire import (WINDOW_FM, AcquireState, acquire_fm_fine,
                                   acquire_init_state)
from nrsc5_tpu.ops.decode_fm import p1_decode, pids_decode
from nrsc5_tpu.ops.sync_fm import SyncState, sync_fm_block, sync_init_state

SLACK = C.FFTCP_FM  # offset headroom for clock drift over a scan


class ChainCarry(NamedTuple):
    offset: jax.Array  # int32 read position in the sample buffer
    acq: AcquireState
    sync: SyncState
    samperr_fb: jax.Array  # int32 previous block's clock-error estimate
    angle_fb: jax.Array  # float32 previous block's CFO-angle estimate


def chain_init_carry(offset: int = 0) -> ChainCarry:
    return ChainCarry(
        offset=jnp.asarray(offset, jnp.int32),
        acq=acquire_init_state(),
        sync=sync_init_state(),
        samperr_fb=jnp.asarray(0, jnp.int32),
        angle_fb=jnp.asarray(0.0, jnp.float32),
    )


class PxState(NamedTuple):
    """Carried interleaver-IV state for the extended (PX) channels; a
    separate pytree (not part of ChainCarry) so the common MP1 path and
    existing checkpoints keep their carry structure."""
    px1_internal: jax.Array  # [N or 0] int8
    px1_phase: jax.Array  # int32 IV call phase
    px2_internal: jax.Array  # [N or 0] int8
    px2_phase: jax.Array  # int32


def px_frame_lens(psmi: int) -> tuple[int, int]:
    """(px1 frame_len, px2 frame_len) in bits; 0 = channel absent
    (reference service-mode map: src/sync.c:30-35,339-357)."""
    cm = C.COMPATIBILITY_MODE[psmi]
    px1 = {2: C.P3_FRAME_LEN_MP2, 3: C.P3_FRAME_LEN_MP3_MP11,
           11: C.P3_FRAME_LEN_MP3_MP11}.get(cm, 0)
    px2 = C.P3_FRAME_LEN_MP3_MP11 if cm == 11 else 0
    return px1, px2


def px_scan_pairs(px_scanned, n_blocks: int, first_bc: int,
                  fl1: int, fl2: int, states: dict, decode: bool = True):
    """Shared PX interleaver-IV processing over pair-aligned block LLRs —
    used by both the complex and the real-valued fused chains (they must
    stay bit-identical twins).

    Only the deinterleave runs inside the sequential pair scan (the IV
    buffer is the carried state); the K=7 Viterbi is stateless across
    calls and runs batched over all pairs afterwards (``decode=True``) —
    or is left to the caller (``decode=False`` returns ``pxN_full`` LLRs
    so a station-batched caller can flat-batch the FEC, see
    ``fm_chain_batch_rc``).

    ``states`` maps ``"px1"``/``"px2"`` (active channels only) to their
    ``(iv_internal, call_phase)`` carry.  Returns ``(outputs, new_states)``
    where outputs holds ``pxN`` bits and ``pxN_margin`` per pair.
    """
    assert first_bc % 2 == 0 and n_blocks % 2 == 0, \
        "PX decode needs pair-aligned blocks"
    from nrsc5_tpu.ops import interleavers as IL
    from nrsc5_tpu.ops.decode_fm import px_fec, px_iv_call
    out, new_states = {}, {}
    idx = 0
    for key, fl in (("px1", fl1), ("px2", fl2)):
        if not fl:
            continue
        llrs = px_scanned[idx].reshape(n_blocks // 2, 2 * fl)
        idx += 1
        _, _, calls = IL.p3_iv_tables(fl)

        def px_step(c, llr, fl=fl, calls=calls):
            internal, ph = c
            full, internal = px_iv_call(internal, llr, ph, fl)
            return (internal, (ph + 1) % calls), full

        new_states[key], fulls = jax.lax.scan(px_step, states[key], llrs)
        if decode:
            bits, margins = px_fec(fulls, fl)
            out[key] = bits
            out[key + "_margin"] = margins
        else:
            out[key + "_full"] = fulls
    return out, new_states


def iv_state_len(frame_len: int) -> int:
    if frame_len == 0:
        return 0
    from nrsc5_tpu.ops import interleavers as IL
    _, n, _ = IL.p3_iv_tables(frame_len)
    return n


def px_init_state(psmi: int) -> PxState:
    fl1, fl2 = px_frame_lens(psmi)
    return PxState(
        px1_internal=jnp.zeros(iv_state_len(fl1), jnp.int8),
        px1_phase=jnp.asarray(0, jnp.int32),
        px2_internal=jnp.zeros(iv_state_len(fl2), jnp.int8),
        px2_phase=jnp.asarray(0, jnp.int32),
    )


def buffer_len(n_blocks: int) -> int:
    """Sample-buffer length the scan expects for ``n_blocks`` blocks."""
    return n_blocks * C.BLKSZ * C.FFTCP_FM + C.FFTCP_FM + SLACK


@functools.partial(jax.jit, static_argnames=("n_blocks", "psmi"))
def fm_frontend_scan(samples: jax.Array, carry: ChainCarry,
                     n_blocks: int, psmi: int = 1):
    """Run ``n_blocks`` FINE-state L1 blocks over ``samples``.

    samples: [buffer_len(n_blocks)] complex64 at 744187.5 S/s; the first
      OFDM symbol must start ``FFTCP//2 + carry.offset`` samples in (the
      steady-state framing the COARSE path establishes).
    Returns (pm [n_blocks, 23040] int8, diag dict, px_scanned tuple of
    per-block PX1/PX2 soft-bit arrays (empty for MP1), new_carry).
    """
    fftcp = C.FFTCP_FM

    def step(cy: ChainCarry, _):
        window = jax.lax.dynamic_slice(samples, (cy.offset,), (WINDOW_FM,))
        spectra, acq, samperr, angle, keep = acquire_fm_fine(
            window, cy.acq, cy.samperr_fb, cy.angle_fb,
            jnp.asarray(0, jnp.int32))
        out, sync = sync_fm_block(spectra, cy.sync, psmi,
                                  fftcp // 2 - samperr)
        consumed = WINDOW_FM - keep
        ncy = ChainCarry(offset=cy.offset + consumed, acq=acq, sync=sync,
                         samperr_fb=out["samperr"], angle_fb=out["angle"])
        px = tuple(out[key] for key in ("px1", "px2") if key in out)
        return ncy, (out["pm"], out["samperr"], out["error_lb"],
                     out["error_ub"]) + px

    carry, scanned = jax.lax.scan(step, carry, None, length=n_blocks)
    pm, samperr, elb, eub = scanned[:4]
    return pm, {"samperr": samperr, "error": elb + eub,
                "error_lb": elb, "error_ub": eub}, scanned[4:], carry


@functools.partial(jax.jit, static_argnames=("n_blocks", "psmi", "first_bc",
                                             "packed"))
def fm_chain_scan(samples: jax.Array, carry: ChainCarry,
                  n_blocks: int, psmi: int = 1, first_bc: int = 0,
                  px_state: PxState | None = None, packed: bool = False):
    """Full fused chain: frontend scan + batched PIDS/P1 FEC decode.

    ``first_bc`` is the block count of the first block in the buffer; only
    complete P1 frames (16 aligned blocks) inside the scan are decoded.
    For extended service modes pass ``px_state`` (from
    :func:`px_init_state` or handed off from the per-block receiver) and
    the PX1/PX2 channels decode fused as well — one interleaver-IV call
    per block pair, state returned in ``out["px_state"]``; requires
    ``first_bc`` and ``n_blocks`` even so block pairs align.
    Returns dict with p1 [F, 146176] uint8, p1_margin [F], pids
    [n_blocks, 80] uint8, diag, and the new carry.
    """
    pm, diag, px_scanned, carry = fm_frontend_scan(samples, carry,
                                                   n_blocks, psmi)

    pids = jax.vmap(pids_decode)(pm)  # [n_blocks, 80]

    skip = (C.P1_FM_BLOCKS - first_bc) % C.P1_FM_BLOCKS
    n_frames = (n_blocks - skip) // C.P1_FM_BLOCKS
    out = {"pids": pids, "diag": diag}
    if n_frames > 0:
        frames = pm[skip: skip + n_frames * C.P1_FM_BLOCKS]
        frames = frames.reshape(n_frames, -1)
        p1, margin, errors = jax.vmap(
            lambda m: p1_decode(m, chunked=True))(frames)
        out["p1"] = p1
        out["p1_margin"] = margin
        out["p1_bit_errors"] = errors

    if px_state is not None:
        fl1, fl2 = px_frame_lens(psmi)
        assert fl1 or fl2, "px_state passed but psmi has no PX channels"
        states = {k: (getattr(px_state, f"{k}_internal"),
                      getattr(px_state, f"{k}_phase"))
                  for k, fl in (("px1", fl1), ("px2", fl2)) if fl}
        px_out, new_states = px_scan_pairs(
            px_scanned, n_blocks, first_bc, fl1, fl2, states)
        out.update(px_out)
        new_px = dict(px_state._asdict())
        for k, (internal, ph) in new_states.items():
            new_px[f"{k}_internal"], new_px[f"{k}_phase"] = internal, ph
        out["px_state"] = PxState(**new_px)
    if packed:
        from nrsc5_tpu.ops.bits import pack_out
        out = pack_out(out)
    return out, carry


def fm_chain_batch(samples: jax.Array, carries: ChainCarry,
                   n_blocks: int, psmi: int = 1, first_bc: int = 0,
                   px_states: PxState | None = None,
                   packed: bool = False):
    """Multi-station batch: ``vmap`` of the fused chain over a leading
    station axis.  samples: [S, buffer_len]; carries: stacked ChainCarry."""
    if px_states is None:
        return jax.vmap(
            lambda s, c: fm_chain_scan(s, c, n_blocks, psmi, first_bc,
                                       None, packed)
        )(samples, carries)
    return jax.vmap(
        lambda s, c, px: fm_chain_scan(s, c, n_blocks, psmi, first_bc, px,
                                       packed)
    )(samples, carries, px_states)


def rebase_carry(carry: ChainCarry, consumed: int) -> ChainCarry:
    """Shift the carry's read offset for the next buffer in a stream.

    After running ``n_blocks`` over a buffer, the host drops ``consumed``
    samples (typically ``n_blocks*BLKSZ*FFTCP`` plus clock drift) and
    presents the remainder at the head of the next buffer; the carried
    offset must be rebased accordingly.
    """
    return carry._replace(offset=carry.offset - consumed)


def carry_to_real(carry: ChainCarry):
    """Split complex leaves into stacked (re, im) float32.

    Some backends (the axon TPU plugin here) cannot transfer complex64
    device buffers to the host — and a failed complex fetch wedges the
    device — so jit boundaries that the host reads from should carry only
    real leaves.  Inverse: :func:`carry_from_real`.
    """
    return jax.tree.map(
        lambda x: jnp.stack([jnp.real(x), jnp.imag(x)])
        if jnp.iscomplexobj(x) else x, carry)


def carry_from_real(carry):
    def merge(ref, x):
        if jnp.iscomplexobj(ref):
            return jax.lax.complex(x[0], x[1]).astype(jnp.complex64)
        return x
    return jax.tree.map(merge, chain_init_carry(), carry)
