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
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import rcplx as rc
from nrsc5_tpu.ops import sync_fm as SF
from nrsc5_tpu.ops.acquire import WINDOW_FM
from nrsc5_tpu.ops.decode_fm import p1_decode, pids_decode
from nrsc5_tpu.pipeline.scan_chain import (  # noqa: F401
    SLACK,
    buffer_len,
    iv_state_len as _iv_state_len,
    px_frame_lens as _px_frame_lens,
)

W = C.PARTITION_WIDTH_FM


class ChainCarryRC(NamedTuple):
    offset: jax.Array  # int32
    phase: jax.Array  # [2] float32 sample-clock phasor (rc)
    prev_angle: jax.Array  # float32
    costas_phase: jax.Array  # [FFT_FM] float32
    costas_freq: jax.Array  # [FFT_FM] float32
    samperr_fb: jax.Array  # int32
    angle_fb: jax.Array  # float32
    cfo: jax.Array  # int32 accumulated integer CFO (bins)
    px1_internal: jax.Array  # [N or 0] int8 interleaver-IV state
    px1_phase: jax.Array  # int32 IV call phase
    px2_internal: jax.Array  # [N or 0] int8
    px2_phase: jax.Array  # int32




def chain_rc_init_carry(offset: int = 0, psmi: int = 1,
                        cfo: int = 0) -> ChainCarryRC:
    fl1, fl2 = _px_frame_lens(psmi)
    return ChainCarryRC(
        offset=jnp.asarray(offset, jnp.int32),
        phase=jnp.asarray(np.array([1.0, 0.0], np.float32)),
        prev_angle=jnp.asarray(0.0, jnp.float32),
        costas_phase=jnp.zeros(C.FFT_FM, jnp.float32),
        costas_freq=jnp.zeros(C.FFT_FM, jnp.float32),
        samperr_fb=jnp.asarray(0, jnp.int32),
        angle_fb=jnp.asarray(0.0, jnp.float32),
        cfo=jnp.asarray(cfo, jnp.int32),
        px1_internal=jnp.zeros(_iv_state_len(fl1), jnp.int8),
        px1_phase=jnp.asarray(0, jnp.int32),
        px2_internal=jnp.zeros(_iv_state_len(fl2), jnp.int8),
        px2_phase=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# acquire (fine path) — rc twin of ops/acquire.py _demod
# ---------------------------------------------------------------------------

def acquire_fine_rc(window, phase, prev_angle, sync_samperr, sync_angle,
                    cfo=None):
    """window: [WINDOW_FM, 2] rc samples, ALREADY conjugated for FM.

    Returns (spectra [32, 2048, 2], phase_out [2], prev_angle_out,
    samperr, keep)."""
    from nrsc5_tpu.ops.acquire_rc import demod_rc
    fftcp = C.FFTCP_FM
    samperr = (fftcp // 2 + sync_samperr).astype(jnp.int32)
    angle = prev_angle - sync_angle
    if cfo is None:
        cfo = jnp.asarray(0, jnp.int32)
    spectra, phase_out, samperr, keep = demod_rc(
        window, phase, samperr, angle, cfo)
    return spectra, phase_out, angle, samperr, keep


# ---------------------------------------------------------------------------
# sync block — rc twin of ops/sync_fm.py sync_fm_block (MP1 geometry)
# ---------------------------------------------------------------------------

def _wrap_pi(x):
    return x - 2 * jnp.pi * jnp.round(x / (2 * jnp.pi))


def _phase_diff(a, b):
    d = a - b
    return d - jnp.pi * jnp.round(d / jnp.pi)


def costas_track_rc(refs, phase0, freq0, cfo_freq=0.0):
    """refs: [32, R, 2]; returns (derot [32,R,2], phases [32,R], ph, fr).
    ``cfo_freq`` adds a static per-track frequency term (used by the
    cold-start integer-CFO scan, ops/acquire_rc.py)."""
    def step(carry, v):
        ph, fr = carry
        v2 = rc.mul(v, v)
        err = 0.5 * _wrap_pi(rc.angle(v2) - 2 * ph)
        derot = rc.mul(v, rc.exp_i(-ph))
        fr = jnp.clip(fr + SF.BETA * err, -0.5, 0.5)
        ph_next = _wrap_pi(ph + fr + cfo_freq + SF.ALPHA * err)
        return (ph_next, fr), (derot, ph)

    # the PLL recurrence is inherently sequential (32 steps/block); the
    # unroll is bit-exact and only reduces while-loop trip overhead
    unroll = int(os.environ.get("NRSC5_COSTAS_UNROLL", "8"))
    (ph_out, fr_out), (derot, phases) = jax.lax.scan(
        step, (phase0, freq0), refs, unroll=unroll)
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

    # per-bin channel-power LLR weighting — rc twin of
    # ops/sync_fm.py (see EQ_MMSE there): deep fades become
    # near-erasures instead of ZF-amplified confident garbage
    if SF.EQ_MMSE():
        h2 = 1.0 / jnp.maximum(rc.abs2(eq), 1e-12)  # [32, 2*ppb, 18]
        w_lb = jnp.clip(h2[:, :ppb] / h2[:, :ppb].mean(
            axis=(1, 2), keepdims=True), 0.0, 1.0)[..., None]
        w_ub = jnp.clip(h2[:, ppb:] / h2[:, ppb:].mean(
            axis=(1, 2), keepdims=True), 0.0, 1.0)[..., None]
    else:
        w_lb = jnp.ones((C.BLKSZ, ppb, C.PARTITION_WIDTH_FM - 1, 1),
                        jnp.float32)
        w_ub = w_lb
    mlb = mult_lb * w_lb
    mub = mult_ub * w_ub

    pm_low = demod(data_eq[:, :C.PM_PARTITIONS],
                   mlb[:, :C.PM_PARTITIONS])
    up = data_eq[:, ppb:ppb + C.PM_PARTITIONS]
    pm_up = demod(up[:, ::-1], mub[:, :C.PM_PARTITIONS][:, ::-1])
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

    # PX1/PX2 extended partitions (static geometry per compatibility
    # mode — rc twin of ops/sync_fm.py:233-252)
    cm = C.COMPATIBILITY_MODE[psmi]
    if cm == 2:
        px1 = jnp.concatenate([
            demod(data_eq[:, 10:11], mlb[:, 10:11]),
            demod(data_eq[:, ppb + 10:ppb + 11], mub[:, 10:11])], axis=1)
        out["px1"] = px1.reshape(-1)  # [2304]
    elif cm in (3, 11):
        px1 = jnp.concatenate([
            demod(data_eq[:, 10:12], mlb[:, 10:12]),
            demod(data_eq[:, ppb + 11:ppb + 12], mub[:, 11:12]),
            demod(data_eq[:, ppb + 10:ppb + 11], mub[:, 10:11])], axis=1)
        out["px1"] = px1.reshape(-1)  # [4608]
    if cm == 11:
        # the reference applies mult_lb to both px2 sidebands
        # (src/sync.c:574-595)
        px2 = jnp.concatenate([
            demod(data_eq[:, 12:14], mlb[:, 12:14]),
            demod(data_eq[:, ppb + 13:ppb + 14],
                  mult_lb * w_ub[:, 13:14]),
            demod(data_eq[:, ppb + 12:ppb + 13],
                  mult_lb * w_ub[:, 12:13])], axis=1)
        out["px2"] = px2.reshape(-1)

    new_phase = costas_phase.at[bins].set(_wrap_pi(ph_out))
    new_freq = costas_freq.at[bins].set(fr_out)
    return out, new_phase, new_freq


# ---------------------------------------------------------------------------
# fused chain
# ---------------------------------------------------------------------------

def frontend_scan_rc(samples, carry: ChainCarryRC, n_blocks: int,
                     psmi: int = 1):
    """The fused per-block frontend (acquire + sync) scan.  Returns
    (pm [n_blocks, ...], diag, px outputs tuple, new carry)."""
    fftcp = C.FFTCP_FM

    def step(cy: ChainCarryRC, _):
        window = jax.lax.dynamic_slice(
            samples, (cy.offset, 0), (WINDOW_FM, 2))
        spectra, phase, prev_angle, samperr, keep = acquire_fine_rc(
            window, cy.phase, cy.prev_angle, cy.samperr_fb, cy.angle_fb,
            cy.cfo)
        out, cph, cfr = sync_block_rc(
            spectra, cy.costas_phase, cy.costas_freq, psmi,
            fftcp // 2 - samperr)
        consumed = WINDOW_FM - keep
        ncy = cy._replace(
            offset=cy.offset + consumed, phase=phase, prev_angle=prev_angle,
            costas_phase=cph, costas_freq=cfr,
            samperr_fb=out["samperr"], angle_fb=out["angle"])
        px = tuple(out[k] for k in ("px1", "px2") if k in out)
        return ncy, (out["pm"], out["samperr"],
                     out["error_lb"], out["error_ub"]) + px

    carry, scanned = jax.lax.scan(
        step, carry, None, length=n_blocks,
        unroll=int(os.environ.get("NRSC5_BLOCK_UNROLL", "1")))
    pm, samperr, elb, eub = scanned[:4]
    return pm, {"samperr": samperr, "error_lb": elb,
                "error_ub": eub}, scanned[4:], carry


@functools.partial(jax.jit, static_argnames=("n_blocks", "psmi", "first_bc",
                                             "packed", "px"))
def fm_chain_scan_rc(samples, carry: ChainCarryRC, n_blocks: int,
                     psmi: int = 1, first_bc: int = 0, packed: bool = False,
                     px: bool = True):
    """samples: [buffer_len(n_blocks), 2] float32 rc at 744187.5 S/s,
    ALREADY conjugated (Im negated) for the FM ingest convention.
    Same outputs as fm_chain_scan, plus px1/px2 frames for extended
    service modes (decoded on device through the carried interleaver-IV
    state; requires first_bc even so block pairs align).  ``px=False``
    skips the PX interleaver-IV processing entirely (used by partial
    frame-alignment dispatches that may be odd-length; the IV warm-up
    dropping downstream absorbs the missed LLR history)."""
    fl1, fl2 = _px_frame_lens(psmi)

    pm, diag, px_scanned, carry = frontend_scan_rc(samples, carry,
                                                   n_blocks, psmi)
    out = {"diag": diag}
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

    # PX channels: interleaver-IV call per block pair, state carried
    # across dispatches (rc analog of pipeline/receiver.py _fine_step);
    # the decode itself is shared with the complex chain (px_scan_pairs)
    if (fl1 or fl2) and px:
        from nrsc5_tpu.pipeline.scan_chain import px_scan_pairs
        states = {k: (getattr(carry, f"{k}_internal"),
                      getattr(carry, f"{k}_phase"))
                  for k, fl in (("px1", fl1), ("px2", fl2)) if fl}
        px_out, new_states = px_scan_pairs(
            px_scanned, n_blocks, first_bc, fl1, fl2, states)
        out.update(px_out)
        for k, (internal, ph) in new_states.items():
            carry = carry._replace(**{f"{k}_internal": internal,
                                      f"{k}_phase": ph})
    if packed:
        from nrsc5_tpu.ops.bits import pack_out
        out = pack_out(out)
    return out, carry


def fm_chain_batch_rc(samples, carries: ChainCarryRC, n_blocks: int,
                      psmi: int = 1, first_bc: int = 0,
                      packed: bool = False):
    """Station batch; samples [S, buffer_len, 2].

    NOT a plain vmap of :func:`fm_chain_scan_rc`: the P1 FEC is
    flat-batched over stations × frames — a nested (S, F) batch measures
    >2× slower than the equivalent flat (S·F,) batch on TPU (layout), so
    multi-frame dispatches would scale superlinearly.  Outputs are
    bit-identical to the per-station scan (pinned by tests).

    ``packed=True`` returns the decoded p1/px frames bit-packed 8x
    (``ops.bits.unpack_bits`` host-side) — on the tunneled accelerator
    every program output is transferred eagerly at ~50 MB/s, so the
    unpacked frames would dominate dispatch time."""
    fl1, fl2 = _px_frame_lens(psmi)
    pm, diag, px_scanned, carry = jax.vmap(
        lambda s, c: frontend_scan_rc(s, c, n_blocks, psmi)
    )(samples, carries)
    out = {"diag": diag}
    out["pids"] = jax.vmap(jax.vmap(pids_decode))(pm)

    skip = (C.P1_FM_BLOCKS - first_bc) % C.P1_FM_BLOCKS
    n_frames = (n_blocks - skip) // C.P1_FM_BLOCKS
    n_stations = pm.shape[0]
    if n_frames > 0:
        frames = pm[:, skip: skip + n_frames * C.P1_FM_BLOCKS]
        flat = frames.reshape(n_stations * n_frames, -1)
        B = flat.shape[0]
        # XLA pays a near-constant ~140 ms for any flat Viterbi batch
        # >= 64 on v5e (round-4 sweep, support/probe_fec_sweep.py:
        # ms/frame 32->1.31, 56->1.64, 64->2.12, 72->2.12, 96->1.45,
        # 128->1.10 — the round-3 pad-to-72 rule no longer helps in the
        # current program).  Batches in the hump are SPLIT into two
        # sequential half-batches of the fast shape instead of padded:
        # 64 -> 2x32 measures 84 ms vs 136 single.  B >= 96 rides the
        # flat region and stays one call (splitting 128 would be
        # slower).  Bit-exact: the batch dim is embarrassingly
        # parallel.
        def fec(m):
            return jax.vmap(lambda x: p1_decode(x, chunked=True))(m)
        if 56 < B < 96:
            half = B // 2
            a, b = fec(flat[:half]), fec(flat[half:])
            p1, margin, errors = (jnp.concatenate([x, y])
                                  for x, y in zip(a, b))
        else:
            p1, margin, errors = fec(flat)
        out["p1"] = p1.reshape(n_stations, n_frames, -1)
        out["p1_margin"] = margin.reshape(n_stations, n_frames)
        out["p1_bit_errors"] = errors.reshape(n_stations, n_frames)

    if fl1 or fl2:
        from nrsc5_tpu.ops.decode_fm import px_fec
        from nrsc5_tpu.pipeline.scan_chain import px_scan_pairs
        keys = [k for k, fl in (("px1", fl1), ("px2", fl2)) if fl]
        states = {k: (getattr(carry, f"{k}_internal"),
                      getattr(carry, f"{k}_phase")) for k in keys}

        def do_px(px_sc, sts):
            # IV deinterleave per station; the K=7 FEC is flat-batched
            # across stations × pairs below (see the batch-layout note)
            return px_scan_pairs(px_sc, n_blocks, first_bc, fl1, fl2,
                                 sts, decode=False)

        px_out, new_states = jax.vmap(do_px)(px_scanned, states)
        for k, fl in (("px1", fl1), ("px2", fl2)):
            if not fl:
                continue
            bits, margins = px_fec(px_out[k + "_full"], fl)
            out[k] = bits
            out[k + "_margin"] = margins
        for k, (internal, ph) in new_states.items():
            carry = carry._replace(**{f"{k}_internal": internal,
                                      f"{k}_phase": ph})
    if packed:
        from nrsc5_tpu.ops.bits import pack_out
        out = pack_out(out)
    return out, carry


# ---------------------------------------------------------------------------
# cold start: coarse timing + integer-CFO/block-offset search + bc probe
# ---------------------------------------------------------------------------

@jax.jit
def coldstart_probe_rc(samples):
    """Probe 1 (device): coarse CP-correlation timing on the first
    33-symbol window, demodulate it, and run the batched CFO×offset
    needle search (reference: src/acquire.c:129-151 + src/sync.c:292-337).

    samples: [>= WINDOW_FM, 2] conjugated rc.
    Returns (samperr int32, angle float32, count int32 [76, 32])."""
    from nrsc5_tpu.ops.acquire_rc import (coarse_timing_rc, demod_rc,
                                          detect_cfo_scan_rc)
    window = jax.lax.dynamic_slice(samples, (0, 0), (WINDOW_FM, 2))
    samperr, max_v = coarse_timing_rc(window)
    angle = rc.angle(max_v)
    unit = jnp.asarray(np.array([1.0, 0.0], np.float32))
    spectra, _, _, _ = demod_rc(window, unit, samperr, angle,
                                jnp.asarray(0, jnp.int32))
    count = detect_cfo_scan_rc(spectra)
    return samperr, angle, count


@jax.jit
def bc_probe_rc(samples, offset, angle, cfo):
    """Probe 2 (device): demodulate one block at ``offset`` and read the
    reference-subcarrier DBPSK control word (block count + service mode)
    by majority over good refs (reference: src/sync.c:366-421).

    Returns (ref_ok bool [2R], ref_bc int32 [2R], ref_psmi int32 [2R])."""
    from nrsc5_tpu.ops.acquire_rc import demod_rc
    window = jax.lax.dynamic_slice(samples, (offset, 0), (WINDOW_FM, 2))
    unit = jnp.asarray(np.array([1.0, 0.0], np.float32))
    samperr = jnp.asarray(C.FFTCP_FM // 2, jnp.int32)
    spectra, _, _, _ = demod_rc(window, unit, samperr, angle, cfo)
    out, _, _ = sync_block_rc(spectra, jnp.zeros(C.FFT_FM, jnp.float32),
                              jnp.zeros(C.FFT_FM, jnp.float32), 1,
                              jnp.asarray(0, jnp.int32))
    return out["ref_ok"], out["ref_bc"], out["ref_psmi"]


def cold_start_device_rc(samples):
    """Fully-on-device cold start (no host in the loop — usable inside
    shard_map for self-synchronizing time shards).

    samples: [N, 2] conjugated rc with N >= WINDOW_FM + 33 blocks.
    Returns device scalars (offset int32, first_bc int32, cfo int32,
    angle float32, locked bool): ``offset`` is where the fused chain
    should start reading (symbol boundary − FFTCP//2), ``first_bc`` the
    block count there.
    """
    fftcp = C.FFTCP_FM
    from nrsc5_tpu.ops.detect_cfo import CFO_RANGE
    samperr, angle, count = coldstart_probe_rc(samples)
    flat = jnp.argmax(count.reshape(-1))
    ci = (flat // C.BLKSZ).astype(jnp.int32)
    off = (flat % C.BLKSZ).astype(jnp.int32)
    locked = count.reshape(-1)[flat] >= 3
    cfo = ci - CFO_RANGE
    start = samperr - fftcp // 2 + off * fftcp
    start = jnp.where(start < 0, start + C.BLKSZ * fftcp, start)

    ok, bcs, psmis = bc_probe_rc(samples, start, angle, cfo)
    votes = ((bcs[:, None] == jnp.arange(16)[None, :])
             & ok[:, None]).sum(axis=0)
    first_bc = jnp.argmax(votes).astype(jnp.int32)
    locked = locked & (ok.sum() >= 4)
    return start, first_bc, cfo, angle, locked


def cold_start_rc(samples_rc) -> dict | None:
    """Host-orchestrated cold start over a conjugated rc capture with
    unknown timing, fractional and integer CFO.

    Two device dispatches (timing+CFO search, then a bc/psmi probe at the
    aligned offset), argmax/majority on host — the fused-chain analog of
    the per-block receiver's NONE→COARSE→FINE machine.  Returns
    ``{"offset", "first_bc", "psmi", "carry"}`` ready for
    :func:`fm_chain_scan_rc` (pass ``samples[offset:]``), or None when no
    lock was found."""
    fftcp = C.FFTCP_FM
    samperr, angle, count = coldstart_probe_rc(samples_rc)
    samperr = int(samperr)
    angle = float(np.asarray(angle))
    count = np.asarray(count)  # [76, 32]
    ci, off = np.unravel_index(np.argmax(count), count.shape)
    if count[ci, off] < 3:
        return None
    from nrsc5_tpu.ops.detect_cfo import CFO_RANGE
    cfo = int(ci) - CFO_RANGE
    # the needle (block boundary) starts at probe-symbol index ``off``
    skip_sym = int(off)

    # the chain (and bc probe) demodulate with samperr = FFTCP//2, i.e.
    # the first symbol starts FFTCP//2 past the buffer offset
    start = samperr - fftcp // 2 + skip_sym * fftcp
    while start < 0:
        start += C.BLKSZ * fftcp

    ok, bcs, psmis = bc_probe_rc(samples_rc, jnp.asarray(start, jnp.int32),
                                 jnp.asarray(angle, jnp.float32),
                                 jnp.asarray(cfo, jnp.int32))
    ok = np.asarray(ok)
    if ok.sum() < 4:
        return None
    vote = lambda a: int(np.bincount(np.asarray(a)[ok]).argmax())  # noqa
    first_bc = vote(bcs)
    psmi = vote(psmis)
    if not 0 <= psmi < len(C.COMPATIBILITY_MODE):
        psmi = 1
    carry = chain_rc_init_carry(psmi=psmi, cfo=cfo)
    carry = carry._replace(prev_angle=jnp.asarray(angle, jnp.float32))
    return {"offset": start, "first_bc": first_bc, "psmi": psmi,
            "carry": carry, "cfo": cfo}
