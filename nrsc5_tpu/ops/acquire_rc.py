"""Cold-start acquisition in the real-valued (rc) formulation.

Round 1 left the accelerator chain FINE-state-only; this module ports the
remaining acquisition stages to the no-complex-dtypes form so a TPU chip
can lock a station from a raw capture with unknown timing and CFO
(reference behaviors: coarse CP correlation src/acquire.c:129-151, the
band filter acquire.c:28-96, integer-CFO + block-offset search
src/sync.c:292-337):

  * :func:`coarse_timing_rc` — band-filter (convolution per I/Q
    component) + cyclic-prefix autocorrelation over all 2160 timings ×
    32 symbols + shaped window sum + argmax;
  * :func:`demod_rc` — the acquire demodulation tail (derotation ramp
    with fractional AND integer-CFO terms, CP fold, DFT-as-matmul);
  * :func:`detect_cfo_scan_rc` — the batched (CFO × block-offset) needle
    search over lockstep Costas tracks.

Equality with the complex-chain counterparts is pinned by
tests/test_scan_chain.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import rcplx as rc
from nrsc5_tpu.ops.acquire import (WINDOW_FM, _cp_window_idx, _shape_kernel)
from nrsc5_tpu.ops.detect_cfo import CFO_RANGE, N_REFS, _needle_tables

__all__ = ["coarse_timing_rc", "demod_rc", "detect_cfo_scan_rc"]


def _conv_full_rc(x, taps):
    """Full convolution of an rc signal with real taps, per component."""
    fr = jnp.convolve(x[..., 0], taps, mode="full")
    fi = jnp.convolve(x[..., 1], taps, mode="full")
    return jnp.stack([fr, fi], axis=-1)


def coarse_timing_rc(window):
    """CP correlation over the 33-symbol window (rc twin of
    ops/acquire.py _coarse_timing, FM only).

    window: [WINDOW_FM, 2] float32, ALREADY conjugated for FM ingest.
    Returns (samperr int32, max_v [2] float32).
    """
    fftcp, fft, cp = C.FFTCP_FM, C.FFT_FM, C.CP_FM
    taps = jnp.asarray(np.asarray(C.ACQ_TAPS_FM, np.float32))
    # f[n] = Σ_o taps[o]·x[n−1−o]  (reference filter, delay 16)
    conv = _conv_full_rc(window, taps)
    f = jnp.concatenate([jnp.zeros((1, 2), window.dtype), conv])[:WINDOW_FM]

    a = f[: fftcp * C.ACQUIRE_SYMBOLS].reshape(C.ACQUIRE_SYMBOLS, fftcp, 2)
    b = f[fft: fft + fftcp * C.ACQUIRE_SYMBOLS].reshape(
        C.ACQUIRE_SYMBOLS, fftcp, 2)
    sums = rc.mul_conj(a, b).sum(axis=0)  # [fftcp, 2]

    # shaped circular window sum over the 112-sample CP
    kernel = jnp.asarray(_shape_kernel(fft, cp))
    ext = jnp.concatenate([sums, sums[: cp - 1]])  # circular extension
    vr = jnp.convolve(ext[:, 0], kernel[::-1], mode="valid")
    vi = jnp.convolve(ext[:, 1], kernel[::-1], mode="valid")
    v = jnp.stack([vr, vi], axis=-1)  # [fftcp, 2]

    i_max = jnp.argmax(rc.abs2(v)).astype(jnp.int32)
    samperr = (i_max + fftcp - C.ACQ_FILTER_DELAY) % fftcp
    return samperr, v[i_max]


def demod_rc(window, phase, samperr, angle, cfo):
    """Acquire demodulation tail (rc twin of ops/acquire.py _demod):
    derotation ramp with fractional + integer-CFO parts, CP fold + shaped
    window, DFT as matmuls.

    window: [WINDOW_FM, 2] conjugated; phase: [2]; samperr int32;
    angle float32; cfo int32 bins.
    Returns (spectra [32, 2048, 2], phase_out [2], samperr, keep).
    """
    fftcp, fft, cp = C.FFTCP_FM, C.FFT_FM, C.CP_FM
    nsym = C.ACQUIRE_SYMBOLS

    n = jnp.arange(nsym * fftcp, dtype=jnp.int32)
    frac = (angle / fft) * n.astype(jnp.float32)
    cfo_mod = ((cfo * n) % fft).astype(jnp.float32)
    ramp_angle = frac - (2 * jnp.pi / fft) * cfo_mod

    adj = (fftcp // 2 - samperr).astype(jnp.float32)
    adj_cfo = ((cfo * (fftcp // 2 - samperr)) % fft).astype(jnp.float32)
    phase0 = rc.normalize(rc.mul(phase, rc.exp_i(
        -adj * angle / fft + (2 * jnp.pi / fft) * adj_cfo)))
    ramp = rc.mul(phase0[None, :], rc.exp_i(ramp_angle)).reshape(
        nsym, fftcp, 2)

    sliced = jax.lax.dynamic_slice(
        window, (samperr, 0), (nsym * fftcp, 2)).reshape(nsym, fftcp, 2)
    x = rc.mul(sliced, ramp)

    w = jnp.asarray(C.ofdm_shape(fft, cp))
    head = w[None, :cp, None] * x[:, :cp] + w[None, fft:, None] * x[:, fft:]
    folded = jnp.concatenate([head, x[:, cp:fft]], axis=1)
    spectra = rc.dft(folded, shift=True)

    total = nsym * fftcp
    phase_out = rc.normalize(rc.mul(phase0, rc.exp_i(
        jnp.asarray(angle / fft * total)
        - (2 * jnp.pi / fft) * ((cfo * total) % fft).astype(jnp.float32))))
    keep = (fftcp + (fftcp // 2 - samperr)).astype(jnp.int32)
    return spectra, phase_out, samperr, keep


def costas_track_cfo_rc(refs, phase0, freq0, cfo_freq):
    """Lockstep Costas with a per-track static frequency offset term —
    delegates to the single PLL implementation in scan_chain_rc (same
    recurrence, same unroll treatment)."""
    from nrsc5_tpu.pipeline.scan_chain_rc import costas_track_rc
    return costas_track_rc(refs, phase0, freq0, cfo_freq)


@jax.jit
def detect_cfo_scan_rc(spectra):
    """spectra: [32, 2048, 2].  Returns count int32 [76, 32] — same
    contract as ops/detect_cfo.detect_cfo_scan."""
    cfos = jnp.arange(-CFO_RANGE, CFO_RANGE, dtype=jnp.int32)
    i = jnp.arange(N_REFS, dtype=jnp.int32)
    bins_l = C.LB_START + cfos[:, None] + C.PARTITION_WIDTH_FM * i[None, :]
    bins_u = C.UB_END + cfos[:, None] - C.PARTITION_WIDTH_FM * i[None, :]
    bins = jnp.concatenate([bins_l, bins_u], axis=1)  # [76, 22]
    refs = spectra[:, bins]  # [32, 76, 22, 2]
    nc = bins.shape[0] * bins.shape[1]
    flat = refs.reshape(C.BLKSZ, nc, 2)

    cfo_freq = (2 * jnp.pi * cfos.astype(jnp.float32) * C.CP_FM / C.FFT_FM)
    cfo_flat = jnp.repeat(cfo_freq, 2 * N_REFS)

    zeros = jnp.zeros(nc, jnp.float32)
    derot, _, _, _ = costas_track_cfo_rc(flat, zeros, zeros, cfo_flat)
    signs = (derot[..., 0] > 0).astype(jnp.uint8)  # [32, nc]

    vals, known = _needle_tables()
    vals_j = jnp.asarray(vals)
    known_j = jnp.asarray(known)

    n_idx = (jnp.arange(C.BLKSZ)[None, :]
             + jnp.arange(C.BLKSZ)[:, None]) % C.BLKSZ
    shifted = signs[n_idx]  # [32 offsets, 32 syms, nc]
    sh = shifted.reshape(C.BLKSZ, C.BLKSZ, len(cfos), 2 * N_REFS)

    eq = sh == vals_j.T[None, :, None, :]
    neq = sh == (1 - vals_j.T[None, :, None, :])
    k = known_j.T[None, :, None, :]
    match = jnp.where(k, eq, True).all(axis=1) \
        | jnp.where(k, neq, True).all(axis=1)
    count = match.sum(axis=-1).astype(jnp.int32)  # [offset, cfo]
    return count.T  # [cfo, offset]
