"""Input front end: cu8 ingest + halfband decimation (FM ÷2, AM ÷32).

TPU-first reformulation of the reference's Q15 FIR front end
(reference: src/input.c:26-90, src/firdecim_q15.c): the 15-tap halfband is
evaluated as a dense batched convolution in float32 (the Q15 fixed-point is
an implementation detail of the ARM target, not the protocol; the accepted
divergence is noted in SURVEY.md §7 "hard parts" #4).  Streaming is
overlap-save: each stage carries its last ``ntaps-1`` input samples.

The halfband impulse response is built from the 4 designed taps
(reference: src/input.c:26-39):  h = [t3 0 t2 0 t1 0 t0 1 t0 0 t1 0 t2 0
t3] / 2, unity DC gain after decimation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C

HB_NTAPS = 15
AM_STAGES = 5


@functools.lru_cache(maxsize=1)
def halfband_taps() -> np.ndarray:
    t = np.asarray(C.DECIM_TAPS, np.float32)
    h = np.zeros(HB_NTAPS, np.float32)
    h[0:7:2] = t[::-1]  # t3 t2 t1 t0 at 0,2,4,6
    h[7] = 1.0
    h[8:15:2] = t  # t0 t1 t2 t3 at 8,10,12,14
    return h / 2.0


class FrontendState(NamedTuple):
    """Carried overlap-save tails, one per halfband stage."""
    tails: tuple  # of [HB_NTAPS-1] complex64


def frontend_init_state(stages: int = 1) -> FrontendState:
    # upload from host rather than an eager device op: eager complex64
    # computations are UNIMPLEMENTED on some backends (axon)
    zero = np.zeros(HB_NTAPS - 1, np.complex64)
    return FrontendState(tails=tuple(
        jnp.asarray(zero) for _ in range(stages)))


def cu8_to_cf(data: jax.Array) -> jax.Array:
    """Interleaved cu8 → complex64, matching the reference's U8_Q15 scaling
    (value 127 = zero, LSB = 64/32767; reference: src/defines.h:92-93)."""
    f = (data.astype(jnp.float32) - 127.0) * (64.0 / 32767.0)
    return f[0::2] + 1j * f[1::2]


def _halfband(x: jax.Array, tail: jax.Array):
    """One ÷2 halfband stage with overlap-save.  x: [..., N] (N even).
    Returns (y [..., N//2], new_tail [..., 14]).

    Polyphase split: a halfband's odd taps are all zero except the center,
    so y[m] = sum_j he[j]*xx[2(m+j)] + 0.5*xx[2m+7] — eight statically
    shifted multiply-adds on the even phase plus one scaled odd sample.
    Pure fused elementwise ops; no gather, no conv lowering."""
    h = halfband_taps()
    he = jnp.asarray(np.ascontiguousarray(h[0::2]))  # 8 even-phase taps
    xx = jnp.concatenate([tail, x], axis=-1)
    n_out = x.shape[-1] // 2
    xe = xx[..., 0::2]
    xo = xx[..., 1::2]
    y = h[7] * jax.lax.slice_in_dim(xo, 3, 3 + n_out, axis=-1) \
        .astype(x.dtype)
    for j in range(8):
        y = y + he[j] * jax.lax.slice_in_dim(xe, j, j + n_out, axis=-1)
    return y.astype(x.dtype), xx[..., -(HB_NTAPS - 1):]


def fm_decimate(x: jax.Array, state: FrontendState):
    """FM path: 744.2k complex out of 1.488M complex in (one halfband;
    reference: src/input.c:52-60)."""
    y, tail = _halfband(x, state.tails[0])
    return y, FrontendState(tails=(tail,))


def am_decimate(x: jax.Array, state: FrontendState):
    """AM path: ÷32 via 5 cascaded halfbands, with the reference's extra
    1/16 input scaling (reference: src/input.c:62-90)."""
    y = x * (1.0 / 16.0)
    tails = []
    for s in range(AM_STAGES):
        y, tail = _halfband(y, state.tails[s])
        tails.append(tail)
    return y, FrontendState(tails=tuple(tails))


fm_decimate_jit = jax.jit(fm_decimate)
am_decimate_jit = jax.jit(am_decimate)


def decimate_batch(x: jax.Array, state: FrontendState, stages: int):
    """Batched multi-stage decimator for the station-parallel path:
    x [S, N] → [S, N >> stages]."""
    y = x
    tails = []
    for s in range(stages):
        y, tail = _halfband(y, state.tails[s])
        tails.append(tail)
    return y, FrontendState(tails=tuple(tails))


# ---------------------------------------------------------------------------
# real-valued (rc) variants for the accelerator serving path — some
# backends (axon) implement no complex ops at all, and the halfband taps
# are real, so I and Q filter independently as a trailing [..., 2] axis.
# ---------------------------------------------------------------------------

def halfband_rc(x: jax.Array, tail: jax.Array):
    """One ÷2 halfband stage on rc data: x [..., N, 2] (N even),
    tail [..., 14, 2] → (y [..., N//2, 2], new_tail).

    Phase split by RESHAPE, not by stride-2 slicing: [..., L, 2] →
    [..., L//2, 2(phase), 2(iq)], then even/odd are selections on a
    size-2 axis and the eight shifted taps are contiguous slices on
    the second-minor axis.  The previous formulation (moveaxis + xx
    [..., 0::2] lane-strided slices) lowered to lane shuffles on TPU
    and ran at 1.8 GB/s; this one measures 34 GB/s on the same shapes
    (18.6×, bit-exact — same taps, same add order; round-5 roofline
    work).  I and Q still filter independently as the trailing axis."""
    h = halfband_taps()
    he = jnp.asarray(np.ascontiguousarray(h[0::2]))  # 8 even-phase taps
    xx = jnp.concatenate([tail, x], axis=-2)         # [..., N+14, 2]
    n_out = x.shape[-2] // 2
    p = xx.reshape(xx.shape[:-2] + (xx.shape[-2] // 2, 2, 2))
    xe, xo = p[..., 0, :], p[..., 1, :]
    y = h[7] * jax.lax.slice_in_dim(xo, 3, 3 + n_out, axis=-2)
    y = y.astype(x.dtype)
    for j in range(8):
        y = y + he[j] * jax.lax.slice_in_dim(xe, j, j + n_out, axis=-2)
    return y.astype(x.dtype), xx[..., -(HB_NTAPS - 1):, :]


def rc_overlap(stages: int) -> int:
    """Input samples of overlap a stateless ``stages``-deep halfband
    cascade consumes: 14·(2^stages − 1).  A caller keeping
    ``rc_overlap(stages) // 2`` samples of history ahead of its logical
    stream position gets ZERO net group delay (each stage's symmetric
    15-tap filter delays by 7 of its input samples)."""
    return (HB_NTAPS - 1) * ((1 << stages) - 1)


def decimate_overlap_rc(x: jax.Array, stages: int) -> jax.Array:
    """Stateless overlap-save cascade for streaming ingest:
    x [..., L, 2] rc with L = rc_overlap(stages) + 2^stages · n_out →
    [..., n_out, 2].  The caller carries the overlap in its sample queue
    (serve.py) instead of threading FIR-tail state through the jit."""
    y = x
    for _ in range(stages):
        y, _ = halfband_rc(y[..., HB_NTAPS - 1:, :],
                           y[..., :HB_NTAPS - 1, :])
    return y
