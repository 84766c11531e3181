"""Coarse acquisition + OFDM demodulation (FM) as a pure JAX block function.

Per invocation this consumes a fixed window of 33 OFDM symbols' samples
(FFTCP*(BLKSZ+1) = 71280 at 744.2 kS/s) and produces the 32 fftshifted
symbol spectra for one L1 block, mirroring the behavior of the reference's
acquire stage (reference: src/acquire.c:98-263) with a TPU-first dataflow:

  * COARSE: the cyclic-prefix autocorrelation over all 2160 candidate
    timings x 32 symbols is one batched elementwise multiply + reduction,
    the 112-tap window sum a gather-matmul, and the timing pick an argmax —
    no state machine on device.
  * FINE: timing/angle come from the sync stage's previous-block estimates.
  * The phase de-rotation ramp is computed in closed form (the integer-CFO
    part in exact modular arithmetic) instead of a sequential
    cumulative product.
  * Symbol folding + 2048-point FFT are batched over the 32 symbols.

The variable sample-consumption ("keep") feedback is returned as a scalar;
the host ring buffer advances by ``FFTCP*(BLKSZ+1) - keep`` (reference:
src/acquire.c:259-262).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C

WINDOW_FM = C.FFTCP_FM * (C.ACQUIRE_SYMBOLS + 1)  # 71280


class AcquireState(NamedTuple):
    """Carried acquisition state (all device scalars)."""
    phase: jax.Array  # complex64 sample-clock phasor
    prev_angle: jax.Array  # float32 smoothed per-FFT angle estimate


def acquire_init_state() -> AcquireState:
    return AcquireState(
        phase=jnp.asarray(1.0 + 0.0j, jnp.complex64),
        prev_angle=jnp.asarray(0.0, jnp.float32),
    )


@functools.lru_cache(maxsize=4)
def _shape_kernel(fft: int, cp: int) -> np.ndarray:
    w = C.ofdm_shape(fft, cp)
    return (w[:cp] * w[fft:]).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _cp_window_idx(fftcp: int, cp: int) -> np.ndarray:
    return ((np.arange(fftcp)[:, None] + np.arange(cp)[None, :]) % fftcp
            ).astype(np.int32)


def _coarse_timing(buf: jax.Array):
    """CP correlation over the 33-symbol window.

    buf: [WINDOW_FM] complex64 (already conjugated).  Returns
    (samperr int32, max_v complex64).
    """
    taps = np.asarray(C.ACQ_TAPS_FM, np.float32)
    # y[n] = sum_j taps[j] * x[n-1-j]  (reference filter, group delay 16;
    # zero-padded at the block edge)
    pad = jnp.zeros(32, buf.dtype)
    x = jnp.concatenate([pad, buf])  # x[m] = buf[m-32]
    idx = jnp.arange(WINDOW_FM)[:, None] + jnp.arange(32)[None, :]
    kern = jnp.asarray(taps[::-1].copy())  # offset o <-> delay 32-o
    f = (x[idx] * kern[None, :]).sum(-1)

    fftcp, fft, cp = C.FFTCP_FM, C.FFT_FM, C.CP_FM
    a = f[: fftcp * C.ACQUIRE_SYMBOLS].reshape(C.ACQUIRE_SYMBOLS, fftcp)
    b = f[fft: fft + fftcp * C.ACQUIRE_SYMBOLS].reshape(C.ACQUIRE_SYMBOLS, fftcp)
    sums = (a * jnp.conj(b)).sum(axis=0)  # [fftcp]

    widx = jnp.asarray(_cp_window_idx(fftcp, cp))
    kernel = jnp.asarray(_shape_kernel(fft, cp))
    v = (sums[widx] * kernel[None, :]).sum(-1)  # [fftcp]
    i_max = jnp.argmax(jnp.abs(v) ** 2).astype(jnp.int32)
    samperr = (i_max + fftcp - C.ACQ_FILTER_DELAY) % fftcp
    return samperr, v[i_max]


def _demod(buf: jax.Array, state: AcquireState, samperr: jax.Array,
           angle: jax.Array, cfo: jax.Array):
    """Shared FINE/COARSE demodulation tail of the acquire step: de-rotation
    ramp, CP fold + windowing, batched FFT (reference: src/acquire.c:237-262).

    buf: [WINDOW_FM] complex64 (already conjugated).
    Returns (spectra, new_state, samperr, angle, keep).
    """
    fftcp, fft, cp = C.FFTCP_FM, C.FFT_FM, C.CP_FM
    nsym = C.ACQUIRE_SYMBOLS
    prev_angle_out = angle

    # de-rotation ramp; integer-CFO part in exact modular arithmetic
    cfo_f = cfo.astype(jnp.float32)
    n = jnp.arange(nsym * fftcp, dtype=jnp.int32)
    frac = jnp.exp(1j * (angle / fft) * n.astype(jnp.float32))
    cfo_mod = ((cfo.astype(jnp.int64) * n.astype(jnp.int64)) % fft).astype(jnp.float32)
    intc = jnp.exp(-2j * jnp.pi / fft * cfo_mod)
    # initial phase adjustment by (fftcp/2 - samperr) samples
    adj = (fftcp // 2 - samperr).astype(jnp.float32)
    phase0 = state.phase * jnp.exp(-1j * adj * angle / fft) \
        * jnp.exp(2j * jnp.pi / fft * ((cfo.astype(jnp.int64)
                  * (fftcp // 2 - samperr).astype(jnp.int64)) % fft).astype(jnp.float32))
    phase0 = phase0 / jnp.abs(phase0)
    ramp = (phase0 * frac * intc).reshape(nsym, fftcp)

    sliced = jax.lax.dynamic_slice(buf, (samperr,), (nsym * fftcp,)).reshape(nsym, fftcp)
    x = sliced * ramp

    w = jnp.asarray(C.ofdm_shape(fft, cp))
    head = w[None, :cp] * x[:, :cp] + w[None, fft:] * x[:, fft:]
    folded = jnp.concatenate([head, x[:, cp:fft]], axis=1)
    spectra = jnp.fft.fftshift(jnp.fft.fft(folded, axis=-1), axes=-1)

    # carry-out phase after nsym*fftcp samples
    total = nsym * fftcp
    phase_out = phase0 * jnp.exp(1j * (angle / fft) * total) \
        * jnp.exp(-2j * jnp.pi / fft * ((cfo.astype(jnp.int64) * total) % fft).astype(jnp.float32))
    phase_out = phase_out / jnp.abs(phase_out)

    keep = (fftcp + (fftcp // 2 - samperr)).astype(jnp.int32)
    new_state = AcquireState(phase=phase_out.astype(jnp.complex64),
                             prev_angle=prev_angle_out)
    del cfo_f
    return spectra.astype(jnp.complex64), new_state, samperr, angle, keep


def acquire_fm(
    window: jax.Array,
    state: AcquireState,
    fine: jax.Array,
    sync_samperr: jax.Array,
    sync_angle: jax.Array,
    cfo: jax.Array,
):
    """One acquire step.

    window: [WINDOW_FM] complex64 raw samples (unconjugated).
    fine: bool — sync is in FINE state (use sync feedback instead of the
      CP correlation).
    sync_samperr/sync_angle: feedback from the previous sync block.
    cfo: int32 accumulated integer CFO in bins.

    Returns (spectra [32, 2048] complex64 fftshifted, new_state,
             samperr int32, angle float32, keep int32).
    """
    fftcp = C.FFTCP_FM
    buf = jnp.conj(window)  # FM ingest conjugates (src/acquire.c:126,161)

    def fine_branch():
        samperr = (fftcp // 2 + sync_samperr).astype(jnp.int32)
        angle = state.prev_angle - sync_angle
        return samperr, angle

    def coarse_branch():
        samperr, max_v = _coarse_timing(buf)
        angle_diff = jnp.angle(max_v * jnp.exp(-1j * state.prev_angle))
        factor = jnp.where(state.prev_angle != 0, 0.25, 1.0)
        angle = state.prev_angle + angle_diff * factor
        return samperr, angle.astype(jnp.float32)

    samperr, angle = jax.lax.cond(fine, fine_branch, coarse_branch)
    return _demod(buf, state, samperr, angle, cfo)


def acquire_fm_fine(
    window: jax.Array,
    state: AcquireState,
    sync_samperr: jax.Array,
    sync_angle: jax.Array,
    cfo: jax.Array,
):
    """FINE-only acquire step for the steady-state fused chain: skips the
    coarse CP-correlation search entirely (statically), so the compiled
    block step is just ramp + fold + FFT.  Same returns as :func:`acquire_fm`.
    """
    fftcp = C.FFTCP_FM
    buf = jnp.conj(window)
    samperr = (fftcp // 2 + sync_samperr).astype(jnp.int32)
    angle = state.prev_angle - sync_angle
    return _demod(buf, state, samperr, angle, cfo)
