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
    Returns (pm [n_blocks, 23040] int8, diag dict, new_carry).
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
        return ncy, (out["pm"], out["samperr"], out["error_lb"],
                     out["error_ub"])

    carry, (pm, samperr, elb, eub) = jax.lax.scan(step, carry, None,
                                                  length=n_blocks)
    return pm, {"samperr": samperr, "error": elb + eub,
                "error_lb": elb, "error_ub": eub}, carry


@functools.partial(jax.jit, static_argnames=("n_blocks", "psmi", "first_bc"))
def fm_chain_scan(samples: jax.Array, carry: ChainCarry,
                  n_blocks: int, psmi: int = 1, first_bc: int = 0):
    """Full fused chain: frontend scan + batched PIDS/P1 FEC decode.

    ``first_bc`` is the block count of the first block in the buffer; only
    complete P1 frames (16 aligned blocks) inside the scan are decoded.
    Returns dict with p1 [F, 146176] uint8, p1_margin [F], pids
    [n_blocks, 80] uint8, diag, and the new carry.
    """
    pm, diag, carry = fm_frontend_scan(samples, carry, n_blocks, psmi)

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
    return out, carry


def fm_chain_batch(samples: jax.Array, carries: ChainCarry,
                   n_blocks: int, psmi: int = 1, first_bc: int = 0):
    """Multi-station batch: ``vmap`` of the fused chain over a leading
    station axis.  samples: [S, buffer_len]; carries: stacked ChainCarry."""
    return jax.vmap(
        lambda s, c: fm_chain_scan(s, c, n_blocks, psmi, first_bc)
    )(samples, carries)


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
