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


def _am_tone_subtract(buf: jax.Array) -> jax.Array:
    """Estimate and coherently subtract the dominant tone (the AM carrier).

    Through any static multipath channel the carrier stays a single complex
    exponential (a 2-ray channel is just a complex gain at one frequency),
    so estimating (f, amplitude) and subtracting removes the lag-constant
    "pedestal" it adds to the cyclic-prefix correlation — the term that
    flattens coarse timing under strong echoes.  Unlike the reference's
    pre-sync band filter (src/acquire.c:63-96, which nulls the carrier but
    also the entire inner band, blinding it to MA3), this keeps every OFDM
    partition, so MA1 and MA3 both stay cold-startable.

    Estimator: per-symbol DFT argmax (integer bin, handles any integer CFO)
    → local fine grid of projections + parabolic interpolation → two Newton
    steps on |S(f)|² with a centered index for f32 conditioning → coherent
    least-squares amplitude → subtract.  All O(N) elementwise/reduction ops.
    """
    fftcp, fft = C.FFTCP_AM, C.FFT_AM
    nsym = C.ACQUIRE_SYMBOLS
    N = buf.shape[0]

    # integer bin: average per-symbol DFT power (tone leaks but argmax holds)
    sym = buf[: fftcp * nsym].reshape(nsym, fftcp)[:, :fft]
    power = (jnp.abs(jnp.fft.fft(sym, axis=1)) ** 2).sum(0)
    k0 = jnp.argmax(power).astype(jnp.int32)
    k0 = jnp.where(k0 >= fft // 2, k0 - fft, k0)

    # fine grid around k0: derotate by the integer bin (exact mod phase),
    # then project onto 85 sub-bin offsets and refine parabolically
    nint = jnp.arange(N, dtype=jnp.int32)
    nf = nint.astype(jnp.float32)
    ph_int = ((k0 * nint) % fft).astype(jnp.float32)
    z = buf * jnp.exp(-2j * jnp.pi / fft * ph_int)
    u = jnp.linspace(-0.6, 0.6, 85).astype(jnp.float32)
    basis = jnp.exp(-2j * jnp.pi / fft * (u[:, None] * nf[None, :]))
    P = jnp.abs(basis @ z) ** 2
    i = jnp.clip(jnp.argmax(P), 1, 83)
    den = P[i - 1] - 2 * P[i] + P[i + 1]
    d = jnp.where(den != 0, 0.5 * (P[i - 1] - P[i + 1]) / den, 0.0)
    ustar = u[i] + jnp.clip(d, -1.0, 1.0) * (u[1] - u[0])
    f = (k0.astype(jnp.float32) + ustar) / fft  # cycles/sample

    # Newton refinement of argmax |S(f)|²; centered index keeps the f32
    # moment sums well-conditioned
    m = nf - (N - 1) / 2.0

    def newton(f, _):
        e = jnp.exp(-2j * jnp.pi * f * m)
        xe = buf * e
        S = xe.sum()
        w = -2 * jnp.pi * m
        dS = 1j * (xe * w).sum()
        d2S = -((w ** 2) * xe).sum()
        g = 2 * jnp.real(jnp.conj(S) * dS)
        h = 2 * jnp.abs(dS) ** 2 + 2 * jnp.real(jnp.conj(S) * d2S)
        return jnp.where(h < 0, f - g / h, f), None

    f, _ = jax.lax.scan(newton, f, None, length=2)
    e = jnp.exp(-2j * jnp.pi * f * m)
    amp = (buf * e).sum() / N
    return buf - amp * jnp.conj(e)


def _coarse_timing(buf: jax.Array, am: bool = False):
    """CP correlation over the 33-symbol window.

    buf: [WINDOW] complex64 (already conjugated for FM).  Returns
    (samperr int32, max_v complex64).
    """
    window = WINDOW_AM if am else WINDOW_FM
    fftcp = C.FFTCP_AM if am else C.FFTCP_FM
    fft = C.FFT_AM if am else C.FFT_FM
    cp = C.CP_AM if am else C.CP_FM
    if am:
        # Divergence from the reference: its AM band filter
        # (src/acquire.c:60-96) passes only |f|~0.2-0.35 fs — the MA1
        # *outer* QAM64 partitions.  An MA3 (all-digital) signal occupies
        # only the inner band (carriers |i| <= 53), which that filter
        # nulls, so the filtered CP correlation has no signal to lock on.
        # Instead of the band filter we coherently subtract the carrier
        # tone (see _am_tone_subtract) — this kills the lag-constant
        # carrier pedestal that flattens the CP correlation under strong
        # multipath while keeping BOTH modes' full OFDM band.
        f = _am_tone_subtract(buf)
        delay = 0
    else:
        taps = np.asarray(C.ACQ_TAPS_FM, np.float32)
        # y[n] = sum_j taps[j] * x[n-1-j]  (reference filter, group delay
        # 16; zero-padded at the block edge)
        pad = jnp.zeros(32, buf.dtype)
        x = jnp.concatenate([pad, buf])  # x[m] = buf[m-32]
        idx = jnp.arange(window)[:, None] + jnp.arange(32)[None, :]
        kern = jnp.asarray(taps[::-1].copy())  # offset o <-> delay 32-o
        f = (x[idx] * kern[None, :]).sum(-1)
        delay = C.ACQ_FILTER_DELAY

    a = f[: fftcp * C.ACQUIRE_SYMBOLS].reshape(C.ACQUIRE_SYMBOLS, fftcp)
    b = f[fft: fft + fftcp * C.ACQUIRE_SYMBOLS].reshape(C.ACQUIRE_SYMBOLS, fftcp)
    sums = (a * jnp.conj(b)).sum(axis=0)  # [fftcp]
    # NOTE (AM): a lag-mean "carrier pedestal" subtraction on ``sums`` was
    # tried here (round 3).  Measured end to end it HURT: the subtracted
    # argmax is seed-unstable on clean MA1 captures (32/64 HDC packets at
    # 2 of 4 seeds vs 64/64 without).  The coherent tone subtraction above
    # removes the same pedestal at the signal level without that
    # instability; residual per-block outliers under strong echoes are
    # rejected by the host's timing-consensus latch (receiver_am).
    widx = jnp.asarray(_cp_window_idx(fftcp, cp))
    kernel = jnp.asarray(_shape_kernel(fft, cp))
    v = (sums[widx] * kernel[None, :]).sum(-1)  # [fftcp]
    i_max = jnp.argmax(jnp.abs(v) ** 2).astype(jnp.int32)
    samperr = (i_max + fftcp - delay) % fftcp
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
    # (int32 is ample: |cfo| <= ~80 bins, n < 72k)
    n = jnp.arange(nsym * fftcp, dtype=jnp.int32)
    frac = jnp.exp(1j * (angle / fft) * n.astype(jnp.float32))
    cfo_mod = ((cfo.astype(jnp.int32) * n.astype(jnp.int32)) % fft).astype(jnp.float32)
    intc = jnp.exp(-2j * jnp.pi / fft * cfo_mod)
    # initial phase adjustment by (fftcp/2 - samperr) samples
    adj = (fftcp // 2 - samperr).astype(jnp.float32)
    phase0 = state.phase * jnp.exp(-1j * adj * angle / fft) \
        * jnp.exp(2j * jnp.pi / fft * ((cfo.astype(jnp.int32)
                  * (fftcp // 2 - samperr).astype(jnp.int32)) % fft).astype(jnp.float32))
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
        * jnp.exp(-2j * jnp.pi / fft * ((cfo.astype(jnp.int32) * total) % fft).astype(jnp.float32))
    phase_out = phase_out / jnp.abs(phase_out)

    keep = (fftcp + (fftcp // 2 - samperr)).astype(jnp.int32)
    new_state = AcquireState(phase=phase_out.astype(jnp.complex64),
                             prev_angle=prev_angle_out)
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


# ---------------------------------------------------------------------------
# AM path (reference: src/acquire.c:98-263, mode AM): 256-pt FFT, CP 14,
# no ingest conjugation, the CP fold lands at offset (FFT-CP)/2 in the FFT
# input, and a per-block pilot-phase linear regression refines phase/freq
# before the final demodulation pass.
# ---------------------------------------------------------------------------

WINDOW_AM = C.FFTCP_AM * (C.ACQUIRE_SYMBOLS + 1)  # 8910


def _am_fold_fft(buf: jax.Array, samperr: jax.Array, phase0: jax.Array,
                 angle: jax.Array):
    """Fold+window+FFT all 32 AM symbols with a closed-form phase ramp.

    buf: [WINDOW_AM] complex64.  Returns spectra [32, 256] fftshifted and
    the carry-out phase (unit magnitude).
    """
    fftcp, fft, cp = C.FFTCP_AM, C.FFT_AM, C.CP_AM
    nsym = C.ACQUIRE_SYMBOLS
    offset = (fft - cp) // 2

    n = jnp.arange(nsym * fftcp, dtype=jnp.float32)
    ramp = (phase0 * jnp.exp(1j * (angle / fft) * n)).reshape(nsym, fftcp)
    sliced = jax.lax.dynamic_slice(buf, (samperr,), (nsym * fftcp,)).reshape(
        nsym, fftcp)
    x = sliced * ramp

    w = jnp.asarray(C.ofdm_shape(fft, cp))
    head = w[None, :cp] * x[:, :cp] + w[None, fft:] * x[:, fft:]
    folded = jnp.concatenate([head, x[:, cp:fft]], axis=1)
    folded = jnp.roll(folded, offset, axis=-1)  # fftin[(j+offset) % fft]
    spectra = jnp.fft.fftshift(jnp.fft.fft(folded, axis=-1), axes=-1)

    total = nsym * fftcp
    phase_out = phase0 * jnp.exp(1j * (angle / fft) * total)
    phase_out = phase_out / jnp.abs(phase_out)
    return spectra.astype(jnp.complex64), phase_out


def acquire_am(window: jax.Array, state: AcquireState, fine: jax.Array,
               sync_samperr: jax.Array, cfo_bins: jax.Array,
               coarse_override: jax.Array):
    """One AM acquire step over 33 symbols' samples.

    The pilot at CENTER_AM provides fine CFO by linear regression of its
    unwrapped phase over the block (reference: src/acquire.c:170-240); the
    coarse integer CFO (strongest bin near the center, searched by the host
    from the returned spectra) is folded into ``angle`` as whole rotations
    per FFT, exactly like the reference's ``angle -= 2*pi*cfo``.

    ``coarse_override`` (int32): when >= 0 and not FINE, demodulate with
    this symbol timing instead of the block's own CP-correlation argmax —
    the host feeds back the consensus of recent measurements so one
    outlier block (strong multipath) cannot scramble block alignment.
    The block's own measurement is still returned (last element) so the
    host can keep the consensus current.

    Returns (spectra [32, 256], new_state, samperr, keep int32,
             mag_sums [256] for the coarse CFO search,
             coarse_meas int32 — this block's raw timing measurement,
             -1 in FINE).
    """
    fftcp, fft = C.FFTCP_AM, C.FFT_AM
    nsym = C.ACQUIRE_SYMBOLS

    def fine_branch():
        # AM sync reports only samperr; prev_angle carries over unchanged
        return ((fftcp // 2 + sync_samperr).astype(jnp.int32),
                state.prev_angle, jnp.asarray(-1, jnp.int32))

    def coarse_branch():
        measured, max_v = _coarse_timing(window, am=True)
        samperr = jnp.where(coarse_override >= 0,
                            coarse_override % fftcp, measured)
        angle_diff = jnp.angle(max_v * jnp.exp(-1j * state.prev_angle))
        factor = jnp.where(state.prev_angle != 0, 0.25, 1.0)
        return samperr, (state.prev_angle + angle_diff * factor
                         ).astype(jnp.float32), measured

    samperr, prev_angle, meas = jax.lax.cond(fine, fine_branch, coarse_branch)
    out = _am_process(window, state, samperr, prev_angle, cfo_bins)
    return out + (meas,)


def acquire_am_fine(window: jax.Array, state: AcquireState,
                    sync_samperr: jax.Array, cfo_bins: jax.Array):
    """FINE-only AM acquire for the fused steady-state chain (statically
    skips the coarse CP correlation).  Same returns as :func:`acquire_am`."""
    fftcp = C.FFTCP_AM
    samperr = (fftcp // 2 + sync_samperr).astype(jnp.int32)
    return _am_process(window, state, samperr, state.prev_angle, cfo_bins)


def _am_process(window, state, samperr, prev_angle, cfo_bins):
    fftcp, fft = C.FFTCP_AM, C.FFT_AM
    nsym = C.ACQUIRE_SYMBOLS
    angle = prev_angle - 2 * jnp.pi * cfo_bins.astype(jnp.float32)

    phase0 = state.phase * jnp.exp(
        -1j * (fftcp // 2 - samperr).astype(jnp.float32) * angle / fft)
    phase0 = phase0 / jnp.abs(phase0)

    # pass 1: pilot-phase regression
    spectra1, _ = _am_fold_fft(window, samperr, phase0, angle)
    pilot = spectra1[:, C.CENTER_AM]  # [32]
    dphi = jnp.angle(pilot[1:] * jnp.conj(pilot[:-1]))
    y = jnp.angle(pilot[0]) + jnp.concatenate(
        [jnp.zeros(1), jnp.cumsum(dphi)])
    x = fftcp * (jnp.arange(nsym, dtype=jnp.float32) - (nsym - 1) / 2)
    slope = (x * y).sum() / (x * x).sum()
    # (reference: src/acquire.c:236-239, incl. the empirical -0.06 offset)
    angle2 = angle - slope * fft
    phase_corr = jnp.exp(
        1j * (-y.mean() + slope * nsym * fftcp / 2 - 0.06))
    phase0b = phase0 * phase_corr

    # pass 2: corrected demodulation
    spectra, phase_out = _am_fold_fft(window, samperr, phase0b, angle2)

    mag_sums = jnp.abs(spectra1).sum(axis=0)

    keep = (fftcp + (fftcp // 2 - samperr)).astype(jnp.int32)
    # Carry the regression-corrected angle so a persistent fractional CFO
    # accumulates across blocks instead of being re-estimated from scratch
    # (reference: src/acquire.c:236-240 updates st->prev_angle in place).
    # Convention: angle = prev_angle - 2*pi*cfo_bins, so fold the +2*pi*cfo
    # back in to keep prev_angle CFO-free.
    prev_angle_out = angle2 + 2 * jnp.pi * cfo_bins.astype(jnp.float32)
    new_state = AcquireState(phase=phase_out.astype(jnp.complex64),
                             prev_angle=prev_angle_out.astype(jnp.float32))
    return spectra, new_state, samperr, keep, mag_sums
