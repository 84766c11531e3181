"""Real-valued fused FM chain: no complex dtypes anywhere on device.

Functional twin of :mod:`nrsc5_tpu.pipeline.scan_chain` (which is the
readable reference implementation) with I/Q carried as a trailing [..., 2]
float32 dimension (:mod:`nrsc5_tpu.ops.rcplx`) and the OFDM demodulation
DFT evaluated as MXU matmuls.  Exists because complex64 is unsupported on
some TPU backends (axon) and, even where supported, XLA decomposes complex
to real pairs anyway — this formulation makes the decomposition explicit
and MXU-friendly.  Equality with the complex chain is pinned by tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import rcplx as rc
from nrsc5_tpu.ops import sync_fm as SF
from nrsc5_tpu.ops.acquire import WINDOW_FM
from nrsc5_tpu.ops.decode_fm import p1_decode, pids_decode
from nrsc5_tpu.pipeline.scan_chain import SLACK, buffer_len  # noqa: F401

W = C.PARTITION_WIDTH_FM


class ChainCarryRC(NamedTuple):
    offset: jax.Array  # int32
    phase: jax.Array  # [2] float32 sample-clock phasor (rc)
    prev_angle: jax.Array  # float32
    costas_phase: jax.Array  # [FFT_FM] float32
    costas_freq: jax.Array  # [FFT_FM] float32
    samperr_fb: jax.Array  # int32
    angle_fb: jax.Array  # float32


def chain_rc_init_carry(offset: int = 0) -> ChainCarryRC:
    return ChainCarryRC(
        offset=jnp.asarray(offset, jnp.int32),
        phase=jnp.asarray(np.array([1.0, 0.0], np.float32)),
        prev_angle=jnp.asarray(0.0, jnp.float32),
        costas_phase=jnp.zeros(C.FFT_FM, jnp.float32),
        costas_freq=jnp.zeros(C.FFT_FM, jnp.float32),
        samperr_fb=jnp.asarray(0, jnp.int32),
        angle_fb=jnp.asarray(0.0, jnp.float32),
    )


# ---------------------------------------------------------------------------
# acquire (fine path) — rc twin of ops/acquire.py _demod
# ---------------------------------------------------------------------------

def acquire_fine_rc(window, phase, prev_angle, sync_samperr, sync_angle):
    """window: [WINDOW_FM, 2] rc samples, ALREADY conjugated for FM.

    Returns (spectra [32, 2048, 2], phase_out [2], prev_angle_out,
    samperr, keep)."""
    fftcp, fft, cp = C.FFTCP_FM, C.FFT_FM, C.CP_FM
    nsym = C.ACQUIRE_SYMBOLS
    samperr = (fftcp // 2 + sync_samperr).astype(jnp.int32)
    angle = prev_angle - sync_angle

    n = jnp.arange(nsym * fftcp, dtype=jnp.float32)
    adj = (fftcp // 2 - samperr).astype(jnp.float32)
    phase0 = rc.normalize(rc.mul(phase, rc.exp_i(-adj * angle / fft)))
    ramp = rc.mul(phase0, rc.exp_i((angle / fft) * n)).reshape(
        nsym, fftcp, 2)

    sliced = jax.lax.dynamic_slice(
        window, (samperr, 0), (nsym * fftcp, 2)).reshape(nsym, fftcp, 2)
    x = rc.mul(sliced, ramp)

    w = jnp.asarray(C.ofdm_shape(fft, cp))
    head = w[None, :cp, None] * x[:, :cp] + w[None, fft:, None] * x[:, fft:]
    folded = jnp.concatenate([head, x[:, cp:fft]], axis=1)
    spectra = rc.dft(folded, shift=True)

    total = float(nsym * fftcp)
    phase_out = rc.normalize(rc.mul(phase0, rc.exp_i(
        jnp.asarray(angle / fft * total))))
    keep = (fftcp + (fftcp // 2 - samperr)).astype(jnp.int32)
    return spectra, phase_out, angle, samperr, keep


# ---------------------------------------------------------------------------
# sync block — rc twin of ops/sync_fm.py sync_fm_block (MP1 geometry)
# ---------------------------------------------------------------------------

def _wrap_pi(x):
    return x - 2 * jnp.pi * jnp.round(x / (2 * jnp.pi))


def _phase_diff(a, b):
    d = a - b
    return d - jnp.pi * jnp.round(d / jnp.pi)


def costas_track_rc(refs, phase0, freq0):
    """refs: [32, R, 2]; returns (derot [32,R,2], phases [32,R], ph, fr)."""
    def step(carry, v):
        ph, fr = carry
        v2 = rc.mul(v, v)
        err = 0.5 * _wrap_pi(rc.angle(v2) - 2 * ph)
        derot = rc.mul(v, rc.exp_i(-ph))
        fr = jnp.clip(fr + SF.BETA * err, -0.5, 0.5)
        ph_next = _wrap_pi(ph + fr + SF.ALPHA * err)
        return (ph_next, fr), (derot, ph)

    (ph_out, fr_out), (derot, phases) = jax.lax.scan(
        step, (phase0, freq0), refs)
    return derot, phases, ph_out, fr_out


def sync_block_rc(spectra, costas_phase, costas_freq, psmi: int, timing_adj):
    """spectra: [32, 2048, 2].  Returns (out dict, new_phase, new_freq) —
    same contract as sync_fm_block with rc internals."""
    ppb = C.partitions_per_band(psmi)
    bins = jnp.asarray(SF._ref_bins(ppb))
    r = ppb + 1

    k_rel = (bins - C.FFT_FM // 2).astype(jnp.float32)
    adj_phase = timing_adj.astype(jnp.float32) * k_rel * (2 * jnp.pi / C.FFT_FM)
    phase0 = costas_phase[bins] - adj_phase
    freq0 = costas_freq[bins]

    refs = spectra[:, bins]  # [32, 2R, 2]
    derot, phases, ph_out, fr_out = costas_track_rc(refs, phase0, freq0)

    sync_signs = jnp.asarray(SF._sync_signs())
    score = (derot[..., 0] * sync_signs[:, None]).sum(axis=0)
    flip = score < 0
    derot = jnp.where(flip[None, :, None], -derot, derot)
    phases = jnp.where(flip[None, :], phases + jnp.pi, phases)
    ph_out = jnp.where(flip, ph_out + jnp.pi, ph_out)

    vals, known = SF._needles(ppb)
    signs = (derot[..., 0] > 0).astype(jnp.uint8)
    match = jnp.where(jnp.asarray(known).T, signs == jnp.asarray(vals).T, True)
    ref_ok = match.all(axis=0)
    data = signs ^ jnp.concatenate(
        [jnp.zeros((1, signs.shape[1]), jnp.uint8), signs[:-1]], axis=0)
    wbc = jnp.asarray([8, 4, 2, 1], jnp.int32)
    ref_bc = (data[16:20].astype(jnp.int32) * wbc[:, None]).sum(0)
    wps = jnp.asarray([32, 16, 8, 4, 2, 1], jnp.int32)
    ref_psmi = (data[25:31].astype(jnp.int32) * wps[:, None]).sum(0)

    # equalization
    smag = jnp.abs(derot[..., 0]).mean(axis=0)
    lo_idx = jnp.concatenate([jnp.arange(ppb), r + jnp.arange(ppb) + 1])
    hi_idx = jnp.concatenate([jnp.arange(ppb) + 1, r + jnp.arange(ppb)])
    phi_lo = phases[:, lo_idx]
    phi_hi = phases[:, hi_idx]
    smag_lo = smag[lo_idx]
    smag_hi = smag[hi_idx]
    k = jnp.arange(1, W, dtype=jnp.float32)
    denom = (k[None, None, :, None]
             * rc.scale(rc.exp_i(phi_hi), smag_hi[None, :])[:, :, None, :]
             + (W - k)[None, None, :, None]
             * rc.scale(rc.exp_i(phi_lo), smag_lo[None, :])[:, :, None, :])
    num = jnp.asarray(np.array([W, W], np.float32))
    eq = rc.div(jnp.broadcast_to(num, denom.shape), denom)

    part = np.arange(ppb)
    kk = np.arange(1, W)
    low_bins = C.LB_START + part[:, None] * W + kk[None, :]
    up_bins = C.UB_END - (part[:, None] + 1) * W + kk[None, :]
    data_bins = jnp.asarray(np.concatenate([low_bins, up_bins]).astype(np.int32))
    data_sc = spectra[:, data_bins]  # [32, 2*ppb, 18, 2]
    data_eq = rc.mul(data_sc, eq)

    samperr = _phase_diff(phi_lo[0], phi_hi[0]).sum()
    samperr = samperr / (ppb * 2) * C.FFT_FM / W / (2 * jnp.pi)
    x = k_rel
    y = fr_out
    slope = (x * y).sum() / (x * x).sum()
    samperr = samperr - slope * C.FFT_FM / (2 * jnp.pi) * C.ACQUIRE_SYMBOLS
    samperr_i = jnp.round(samperr).astype(jnp.int32)
    angle = fr_out.mean()
    fr_out = fr_out - angle

    ideal = jnp.stack([jnp.sign(data_eq[..., 0]),
                       jnp.sign(data_eq[..., 1])], axis=-1)
    err2 = rc.abs2(ideal - data_eq)
    error_lb = err2[:, :ppb].sum()
    error_ub = err2[:, ppb:].sum()
    sig_block = 2.0 * C.BLKSZ * (ppb * C.PARTITION_DATA_CARRIERS)
    mult_lb = jnp.clip(sig_block / error_lb * 10, 1, 127)
    mult_ub = jnp.clip(sig_block / error_ub * 10, 1, 127)

    def demod(z, mult):
        return jnp.round(jnp.clip(z, -1, 1) * mult).astype(jnp.int8)

    pm_low = demod(data_eq[:, :C.PM_PARTITIONS], mult_lb)
    up = data_eq[:, ppb:ppb + C.PM_PARTITIONS]
    pm_up = demod(up[:, ::-1], mult_ub)
    pm_block = jnp.concatenate([pm_low, pm_up], axis=1).reshape(C.BLKSZ, -1)

    out = {
        "pm": pm_block.reshape(-1),
        "ref_ok": ref_ok,
        "ref_bc": ref_bc,
        "ref_psmi": ref_psmi,
        "samperr": samperr_i,
        "angle": angle,
        "error_lb": error_lb,
        "error_ub": error_ub,
    }
    new_phase = costas_phase.at[bins].set(_wrap_pi(ph_out))
    new_freq = costas_freq.at[bins].set(fr_out)
    return out, new_phase, new_freq


# ---------------------------------------------------------------------------
# fused chain
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_blocks", "psmi", "first_bc"))
def fm_chain_scan_rc(samples, carry: ChainCarryRC, n_blocks: int,
                     psmi: int = 1, first_bc: int = 0):
    """samples: [buffer_len(n_blocks), 2] float32 rc at 744187.5 S/s,
    ALREADY conjugated (Im negated) for the FM ingest convention.
    Same outputs as fm_chain_scan."""
    fftcp = C.FFTCP_FM

    def step(cy: ChainCarryRC, _):
        window = jax.lax.dynamic_slice(
            samples, (cy.offset, 0), (WINDOW_FM, 2))
        spectra, phase, prev_angle, samperr, keep = acquire_fine_rc(
            window, cy.phase, cy.prev_angle, cy.samperr_fb, cy.angle_fb)
        out, cph, cfr = sync_block_rc(
            spectra, cy.costas_phase, cy.costas_freq, psmi,
            fftcp // 2 - samperr)
        consumed = WINDOW_FM - keep
        ncy = ChainCarryRC(
            offset=cy.offset + consumed, phase=phase, prev_angle=prev_angle,
            costas_phase=cph, costas_freq=cfr,
            samperr_fb=out["samperr"], angle_fb=out["angle"])
        return ncy, (out["pm"], out["samperr"],
                     out["error_lb"] + out["error_ub"])

    carry, (pm, samperr, err) = jax.lax.scan(step, carry, None,
                                             length=n_blocks)
    out = {"diag": {"samperr": samperr, "error": err}}
    pids = jax.vmap(pids_decode)(pm)
    out["pids"] = pids

    skip = (C.P1_FM_BLOCKS - first_bc) % C.P1_FM_BLOCKS
    n_frames = (n_blocks - skip) // C.P1_FM_BLOCKS
    if n_frames > 0:
        frames = pm[skip: skip + n_frames * C.P1_FM_BLOCKS]
        frames = frames.reshape(n_frames, -1)
        p1, margin, errors = jax.vmap(
            lambda m: p1_decode(m, chunked=True))(frames)
        out["p1"] = p1
        out["p1_margin"] = margin
        out["p1_bit_errors"] = errors
    return out, carry


def fm_chain_batch_rc(samples, carries: ChainCarryRC, n_blocks: int,
                      psmi: int = 1, first_bc: int = 0):
    """vmap over a leading station axis; samples [S, buffer_len, 2]."""
    return jax.vmap(
        lambda s, c: fm_chain_scan_rc(s, c, n_blocks, psmi, first_bc)
    )(samples, carries)
