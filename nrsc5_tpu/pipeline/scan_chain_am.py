"""Fused steady-state AM receive chain: jitted scan over frames.

AM analog of :mod:`nrsc5_tpu.pipeline.scan_chain`: once block-synced, the
per-frame control flow is fixed, so 8 blocks of acquire+sync+demap plus the
frame deinterleave/diversity/Viterbi stage become one pure scan step with
the (offset, acquire phase, clock feedback, diversity delay lines) carry.
``vmap`` over a leading station axis batches stations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops.acquire import (WINDOW_AM, AcquireState, acquire_am_fine,
                                   acquire_init_state)
from nrsc5_tpu.ops.decode_am import (AMDecodeState, am_decode_init_state,
                                     am_frame_decode, am_pids_decode)
from nrsc5_tpu.ops.sync_am import sync_am_block

SLACK_AM = C.FFTCP_AM


class AMChainCarry(NamedTuple):
    offset: jax.Array  # int32 read position
    acq: AcquireState
    samperr_fb: jax.Array  # int32
    dec: AMDecodeState


def am_chain_init_carry(offset: int = 0) -> AMChainCarry:
    return AMChainCarry(
        offset=jnp.asarray(offset, jnp.int32),
        acq=acquire_init_state(),
        samperr_fb=jnp.asarray(0, jnp.int32),
        dec=am_decode_init_state(),
    )


def am_buffer_len(n_frames: int) -> int:
    return n_frames * 8 * C.BLKSZ * C.FFTCP_AM + C.FFTCP_AM + SLACK_AM


@functools.partial(jax.jit, static_argnames=("n_frames", "ma3"))
def am_chain_scan(samples: jax.Array, carry: AMChainCarry,
                  n_frames: int, ma3: bool = False):
    """Decode ``n_frames`` AM frames in steady state.

    samples: [am_buffer_len(n_frames)] complex64 at 46511.7 S/s, first
      symbol starting FFTCP_AM//2 in, first block bc=0.
    Returns (dict with p1 [F, 8, 3750], p3 [F, p3_len], pids [F*8, 80],
    margins, new carry).  P1/P3 of the first min(3, F) frames are
    diversity warm-up and not valid.
    """

    def block_step(cy, _):
        offset, acq_st, samperr_fb = cy
        window = jax.lax.dynamic_slice(samples, (offset,), (WINDOW_AM,))
        spectra, acq_st, samperr, keep, _ = acquire_am_fine(
            window, acq_st, samperr_fb, jnp.asarray(0, jnp.int32))
        out = sync_am_block(spectra, ma3)
        consumed = WINDOW_AM - keep
        return (offset + consumed, acq_st, out["samperr"]), out

    def frame_step(cy: AMChainCarry, _):
        (offset, acq, samperr_fb), outs = jax.lax.scan(
            block_step, (cy.offset, cy.acq, cy.samperr_fb), None, length=8)
        # outs: pl/pu/s/t [8, 32*25], pids [8, 32, 2]
        pl = outs["pl"].reshape(-1)
        pu = outs["pu"].reshape(-1)
        s = outs["s"].reshape(-1)
        t = outs["t"].reshape(-1)
        p1, p3, margins, dec = am_frame_decode(pl, pu, s, t, cy.dec, ma3)
        pids = jax.vmap(lambda ps: am_pids_decode(ps, jnp.asarray(False)))(
            outs["pids"])
        ncy = AMChainCarry(offset=offset, acq=acq, samperr_fb=samperr_fb,
                           dec=dec)
        return ncy, {"p1": p1, "p3": p3, "pids": pids,
                     "p1_margin": margins["p1"], "p3_margin": margins["p3"]}

    carry, out = jax.lax.scan(frame_step, carry, None, length=n_frames)
    out["pids"] = out["pids"].reshape(-1, C.PIDS_FRAME_LEN)
    return out, carry


def am_chain_batch(samples: jax.Array, carries: AMChainCarry,
                   n_frames: int, ma3: bool = False):
    """vmap over a leading station axis."""
    return jax.vmap(lambda x, c: am_chain_scan(x, c, n_frames, ma3))(
        samples, carries)
