"""Real-valued fused AM receive chain: I/Q in → frame bits out on device.

rc twin of :mod:`nrsc5_tpu.pipeline.scan_chain_am` (see
:mod:`nrsc5_tpu.ops.rcplx` for the representation): the AM acquire
(two-pass pilot-regression demodulation, reference src/acquire.c:170-240),
sideband combining + training equalization + QAM demap (src/sync.c:612-768)
and the frame FEC all run without complex dtypes, so the whole AM receiver
— not just the hard-symbol FEC tail — executes on backends without
complex support (axon).  Equality with the complex chain is pinned by
tests/test_scan_chain.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import rcplx as rc
from nrsc5_tpu.ops import sync_am as SA
from nrsc5_tpu.ops.acquire import WINDOW_AM
from nrsc5_tpu.ops.decode_am import (AMDecodeState, am_decode_init_state,
                                     am_frame_fec, am_frame_gather,
                                     am_pids_decode)
from nrsc5_tpu.pipeline.scan_chain_am import SLACK_AM, am_buffer_len  # noqa: F401

W = C.PARTITION_WIDTH_AM


class AMChainCarryRC(NamedTuple):
    offset: jax.Array  # int32
    phase: jax.Array  # [2] float32
    prev_angle: jax.Array  # float32
    samperr_fb: jax.Array  # int32
    cfo: jax.Array  # int32 accumulated integer CFO (bins)
    dec: AMDecodeState


def am_chain_rc_init_carry(offset: int = 0,
                           cfo: int = 0) -> AMChainCarryRC:
    return AMChainCarryRC(
        offset=jnp.asarray(offset, jnp.int32),
        phase=jnp.asarray(np.array([1.0, 0.0], np.float32)),
        prev_angle=jnp.asarray(0.0, jnp.float32),
        samperr_fb=jnp.asarray(0, jnp.int32),
        cfo=jnp.asarray(cfo, jnp.int32),
        dec=am_decode_init_state(),
    )


# ---------------------------------------------------------------------------
# acquire (rc twins of ops/acquire.py _am_fold_fft / _am_process)
# ---------------------------------------------------------------------------

def _am_fold_fft_rc(buf, samperr, phase0, angle):
    """buf: [WINDOW_AM, 2].  Returns (spectra [32, 256, 2], phase_out [2])."""
    fftcp, fft, cp = C.FFTCP_AM, C.FFT_AM, C.CP_AM
    nsym = C.ACQUIRE_SYMBOLS
    offset = (fft - cp) // 2

    n = jnp.arange(nsym * fftcp, dtype=jnp.float32)
    ramp = rc.mul(phase0[None, :], rc.exp_i((angle / fft) * n)).reshape(
        nsym, fftcp, 2)
    sliced = jax.lax.dynamic_slice(
        buf, (samperr, 0), (nsym * fftcp, 2)).reshape(nsym, fftcp, 2)
    x = rc.mul(sliced, ramp)

    w = jnp.asarray(C.ofdm_shape(fft, cp))
    head = w[None, :cp, None] * x[:, :cp] + w[None, fft:, None] * x[:, fft:]
    folded = jnp.concatenate([head, x[:, cp:fft]], axis=1)
    folded = jnp.roll(folded, offset, axis=-2)  # fftin[(j+offset) % fft]
    spectra = rc.dft(folded, shift=True)

    total = nsym * fftcp
    phase_out = rc.normalize(rc.mul(phase0, rc.exp_i(
        jnp.asarray(angle / fft * total))))
    return spectra, phase_out


def _am_process_rc(window, phase, samperr, prev_angle, cfo_bins):
    fftcp, fft = C.FFTCP_AM, C.FFT_AM
    nsym = C.ACQUIRE_SYMBOLS
    angle = prev_angle - 2 * jnp.pi * cfo_bins.astype(jnp.float32)

    phase0 = rc.normalize(rc.mul(phase, rc.exp_i(
        -(fftcp // 2 - samperr).astype(jnp.float32) * angle / fft)))

    # pass 1: pilot-phase regression (reference: src/acquire.c:170-240)
    spectra1, _ = _am_fold_fft_rc(window, samperr, phase0, angle)
    pilot = spectra1[:, C.CENTER_AM]  # [32, 2]
    dphi = rc.angle(rc.mul_conj(pilot[1:], pilot[:-1]))
    y = rc.angle(pilot[0]) + jnp.concatenate(
        [jnp.zeros(1), jnp.cumsum(dphi)])
    x = fftcp * (jnp.arange(nsym, dtype=jnp.float32) - (nsym - 1) / 2)
    slope = (x * y).sum() / (x * x).sum()
    angle2 = angle - slope * fft
    phase0b = rc.mul(phase0, rc.exp_i(
        -y.mean() + slope * nsym * fftcp / 2 - 0.06))

    # pass 2: corrected demodulation
    spectra, phase_out = _am_fold_fft_rc(window, samperr, phase0b, angle2)
    mag_sums = rc.rabs(spectra1).sum(axis=0)

    keep = (fftcp + (fftcp // 2 - samperr)).astype(jnp.int32)
    prev_angle_out = (angle2 + 2 * jnp.pi * cfo_bins.astype(jnp.float32)
                      ).astype(jnp.float32)
    return spectra, phase_out, prev_angle_out, samperr, keep, mag_sums


def acquire_am_fine_rc(window, phase, prev_angle, sync_samperr, cfo_bins):
    """FINE-only AM acquire step (rc twin of ops/acquire.py
    acquire_am_fine)."""
    samperr = (C.FFTCP_AM // 2 + sync_samperr).astype(jnp.int32)
    return _am_process_rc(window, phase, samperr, prev_angle, cfo_bins)


# ---------------------------------------------------------------------------
# sync (rc twin of ops/sync_am.py sync_am_block)
# ---------------------------------------------------------------------------

def _qam64_map_rc(z):
    return SA.gray8_map(z[..., 0]) | (SA.gray8_map(z[..., 1]) << 3)


def _qam16_map_rc(z):
    return SA.gray4_map(z[..., 0]) | (SA.gray4_map(z[..., 1]) << 2)


def _qpsk_map_rc(z):
    return ((z[..., 0] >= 0).astype(jnp.uint8)
            | ((z[..., 1] >= 0).astype(jnp.uint8) << 1))


def _const_rc(v: complex) -> jnp.ndarray:
    return jnp.asarray(np.array([v.real, v.imag], np.float32))


@functools.partial(jax.jit, static_argnames=("ma3",))
def sync_am_block_rc(spectra, ma3: bool = False):
    """spectra: [32, 256, 2].  Same outputs as ops/sync_am.sync_am_block."""
    buf = spectra
    c = SA.CENTER

    i = np.arange(C.REF_INDEX_AM, C.MAX_INDEX_AM + 1)
    low = buf[:, c - i]
    buf = buf.at[:, c - i].set(rc.neg_conj(low))

    if not ma3:
        j = np.arange(C.REF_INDEX_AM, C.PIDS_OUTER_INDEX_AM + 1)
        buf = buf.at[:, c + j].add(buf[:, c - j])

    ref_bits = (buf[:, c + C.REF_INDEX_AM, 1] > 0).astype(jnp.uint8)

    pids1_bin = c + (C.PIDS_INNER_INDEX_AM if not ma3
                     else -C.PIDS_INNER_INDEX_AM)
    pids2_bin = c + (C.PIDS_OUTER_INDEX_AM if not ma3
                     else C.PIDS_INNER_INDEX_AM)
    p1col = buf[:, pids1_bin]
    p2col = buf[:, pids2_bin]
    tq16 = _const_rc(2 * SA.TRAIN_QAM16)
    p1m = rc.div(tq16, p1col[8] + p1col[24])
    p2m = rc.div(tq16, p2col[8] + p2col[24])
    pids = jnp.stack([_qam16_map_rc(rc.mul(p1col, p1m[None, :])),
                      _qam16_map_rc(rc.mul(p2col, p2m[None, :]))], axis=1)

    primary = C.OUTER_PARTITION_START_AM if not ma3 \
        else C.INNER_PARTITION_START_AM
    secondary = C.MIDDLE_PARTITION_START_AM
    tertiary = C.INNER_PARTITION_START_AM if not ma3 \
        else C.MIDDLE_PARTITION_START_AM

    col = np.arange(W)
    pl_bins = c - primary - col
    pu_bins = c + primary + col
    s_bins = c + secondary + col
    t_bins = (c + tertiary + col) if not ma3 else (c - tertiary - col)

    t1 = jnp.asarray(SA.TRAIN1)
    t2 = jnp.asarray(SA.TRAIN2)

    def train_mult(bins, nominal):
        cols = buf[:, bins]  # [32, W, 2]
        tr = cols[t1, jnp.arange(W)] + cols[t2, jnp.arange(W)]
        return rc.div(jnp.broadcast_to(_const_rc(2 * nominal), tr.shape), tr)

    pl_mult = train_mult(pl_bins, SA.TRAIN_QAM64)
    pu_mult = train_mult(pu_bins, SA.TRAIN_QAM64)
    s_mult = train_mult(s_bins, SA.TRAIN_QAM64 if ma3 else SA.TRAIN_QAM16)
    t_mult = train_mult(t_bins, SA.TRAIN_QAM64 if ma3 else SA.TRAIN_QPSK)

    dp = SA._wrap_half_pi(rc.angle(pl_mult[1:])
                          - rc.angle(pl_mult[:-1])).sum()
    du = SA._wrap_half_pi(rc.angle(pu_mult[1:])
                          - rc.angle(pu_mult[:-1])).sum()
    samperr = (dp + du) / (2 * (W - 1)) * C.FFT_AM / (2 * jnp.pi)
    samperr = jnp.round(samperr).astype(jnp.int32)

    if SA.AM_EQ_INTERP:
        # rc twin of the interpolated training equalizer (see
        # ops/sync_am.AM_EQ_INTERP): phase anchored at the training
        # midpoint by the averaged mult, the anchor-to-anchor delta
        # linear-fitted across columns (weights = anchor magnitudes)
        # and spread linearly across the 32 symbol rows
        a_lo = jnp.minimum(t1, t2)
        ar = jnp.arange(W)
        u = (jnp.arange(32)[:, None] - a_lo[None, :] - 8) / 16.0  # [32, W]
        colf = jnp.arange(W, dtype=jnp.float32)

        def rows_mult(bins, base):
            cols = buf[:, bins]  # [32, W, 2]
            lo, hi = cols[a_lo, ar], cols[a_lo + 16, ar]
            dphi = SA._wrap_pi(rc.angle(lo) - rc.angle(hi))  # [W]
            w = jnp.sqrt((lo * lo).sum(-1) * (hi * hi).sum(-1)) + 1e-12
            wsum = w.sum()
            cbar = (w * colf).sum() / wsum
            dbar = (w * dphi).sum() / wsum
            b = (w * (colf - cbar) * (dphi - dbar)).sum() \
                / ((w * (colf - cbar) ** 2).sum() + 1e-12)
            fit = dbar + b * (colf - cbar)  # [W]
            th = u * fit[None, :]
            rot = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)
            return rc.mul(base[None], rot)  # [32, W, 2]

        pl_eq = rc.mul(buf[:, pl_bins], rows_mult(pl_bins, pl_mult))
        pu_eq = rc.mul(buf[:, pu_bins], rows_mult(pu_bins, pu_mult))
        s_eq = rc.mul(buf[:, s_bins], rows_mult(s_bins, s_mult))
        t_eq = rc.mul(buf[:, t_bins], rows_mult(t_bins, t_mult))
    else:
        pl_eq = rc.mul(buf[:, pl_bins], pl_mult[None])
        pu_eq = rc.mul(buf[:, pu_bins], pu_mult[None])
        s_eq = rc.mul(buf[:, s_bins], s_mult[None])
        t_eq = rc.mul(buf[:, t_bins], t_mult[None])

    pl_c, pu_c = _qam64_map_rc(pl_eq), _qam64_map_rc(pu_eq)
    if not ma3:
        s_c, t_c = _qam16_map_rc(s_eq), _qpsk_map_rc(t_eq)
    else:
        s_c, t_c = _qam64_map_rc(s_eq), _qam64_map_rc(t_eq)

    return {
        "ref_bits": ref_bits,
        "pids": pids,
        "pl": pl_c.reshape(-1),
        "pu": pu_c.reshape(-1),
        "s": s_c.reshape(-1),
        "t": t_c.reshape(-1),
        "samperr": samperr,
    }


# ---------------------------------------------------------------------------
# fused chain
# ---------------------------------------------------------------------------

def _am_frontend_gather_scan(samples, carry: AMChainCarryRC,
                             n_frames: int, ma3: bool):
    """Per-station sequential part: acquire/sync block scan + bit-plane
    gather/diversity per frame.  The K=9 Viterbis are NOT here — they
    carry no cross-frame state and are flat-batched by the callers
    (nested (station, frame) vmap layouts are >2× slower on TPU; see
    docs/PERF.md batch-layout finding)."""

    def block_step(cy, _):
        offset, phase, prev_angle, samperr_fb, cfo = cy
        window = jax.lax.dynamic_slice(samples, (offset, 0), (WINDOW_AM, 2))
        spectra, phase, prev_angle, samperr, keep, _ = acquire_am_fine_rc(
            window, phase, prev_angle, samperr_fb, cfo)
        out = sync_am_block_rc(spectra, ma3)
        consumed = WINDOW_AM - keep
        return (offset + consumed, phase, prev_angle, out["samperr"],
                cfo), out

    def frame_step(cy: AMChainCarryRC, _):
        (offset, phase, prev_angle, samperr_fb, _cfo), outs = jax.lax.scan(
            block_step, (cy.offset, cy.phase, cy.prev_angle,
                         cy.samperr_fb, cy.cfo), None, length=8)
        pl = outs["pl"].reshape(-1)
        pu = outs["pu"].reshape(-1)
        s = outs["s"].reshape(-1)
        t = outs["t"].reshape(-1)
        p1_full, p3_full, dec = am_frame_gather(pl, pu, s, t, cy.dec, ma3)
        ncy = AMChainCarryRC(offset=offset, phase=phase,
                             prev_angle=prev_angle,
                             samperr_fb=samperr_fb, cfo=cy.cfo, dec=dec)
        return ncy, {"p1_full": p1_full, "p3_full": p3_full,
                     "pids_syms": outs["pids"]}

    return jax.lax.scan(frame_step, carry, None, length=n_frames)


def _am_finish(scanned, ma3: bool, packed: bool):
    """FEC + PIDS decode over the scanned outputs (any leading station
    batch dims; the Viterbi inputs flatten internally)."""
    p1, p3, margins = am_frame_fec(scanned["p1_full"],
                                   scanned["p3_full"], ma3)
    ps = scanned["pids_syms"]
    pids = jax.vmap(lambda q: am_pids_decode(q, jnp.asarray(False)))(
        ps.reshape((-1,) + ps.shape[-2:]))
    # ps: [batch..., n_frames, 8, 32, 2] → pids [batch..., n_frames*8, 80]
    pids = pids.reshape(ps.shape[:-4] + (-1, C.PIDS_FRAME_LEN))
    outs = {"p1": p1, "p3": p3, "pids": pids,
            "p1_margin": margins["p1"], "p3_margin": margins["p3"]}
    if packed:
        # p1 subframes are 3750 bits (not byte-aligned); pack the frame's
        # 8 x 3750 = 30000 bits flattened — unpack host-side then reshape
        from nrsc5_tpu.ops.bits import pack_bits
        outs["p1"] = pack_bits(
            outs["p1"].reshape(outs["p1"].shape[:-2] + (-1,)))
        outs["p3"] = pack_bits(outs["p3"])
        # pids too (80 % 8 == 0), so every PACKED_KEYS entry present is
        # packed and the host-side ops.bits.unpack_out inverse is exact
        outs["pids"] = pack_bits(outs["pids"])
    return outs


@functools.partial(jax.jit, static_argnames=("n_frames", "ma3", "packed"))
def am_chain_scan_rc(samples, carry: AMChainCarryRC, n_frames: int,
                     ma3: bool = False, packed: bool = False):
    """Decode ``n_frames`` AM frames in steady state from rc I/Q.

    samples: [am_buffer_len(n_frames), 2] float32 at 46511.7 S/s, first
    symbol starting FFTCP_AM//2 in, first block bc=0.  Same outputs as
    scan_chain_am.am_chain_scan."""
    carry, scanned = _am_frontend_gather_scan(samples, carry, n_frames, ma3)
    return _am_finish(scanned, ma3, packed), carry


def am_chain_batch_rc(samples, carries, n_frames: int, ma3: bool = False,
                      packed: bool = False):
    """Station batch; samples [S, am_buffer_len, 2].  The frontend scan
    runs per station under vmap; the K=9 FEC is flat-batched across
    stations × frames × subframes (bit-identical to the per-station
    scan, pinned by tests)."""
    carries, scanned = jax.vmap(
        lambda s, c: _am_frontend_gather_scan(s, c, n_frames, ma3)
    )(samples, carries)
    return _am_finish(scanned, ma3, packed), carries


# ---------------------------------------------------------------------------
# cold start (rc analog of the AMReceiver NONE->COARSE->FINE machine,
# pipeline/receiver_am.py; reference: src/acquire.c:129-235 + the
# find_block_am bc-history lock of src/sync.c:635-666)
# ---------------------------------------------------------------------------

def _am_tone_subtract_rc(buf):
    """rc twin of ops/acquire._am_tone_subtract: estimate the dominant
    tone (the AM carrier — still one complex exponential through a static
    multipath channel) and coherently subtract it, killing the
    lag-constant pedestal that flattens the CP correlation under strong
    echoes.  buf: [WINDOW_AM, 2]."""
    fftcp, fft = C.FFTCP_AM, C.FFT_AM
    nsym = C.ACQUIRE_SYMBOLS
    N = buf.shape[0]

    # integer bin: average per-symbol DFT power
    sym = buf[:fftcp * nsym].reshape(nsym, fftcp, 2)[:, :fft]
    power = rc.abs2(rc.dft(sym)).sum(0)  # [fft]
    k0 = jnp.argmax(power).astype(jnp.int32)
    k0 = jnp.where(k0 >= fft // 2, k0 - fft, k0)

    # fine grid around k0 (derotate by the integer bin with exact mod
    # phase, project onto 85 sub-bin offsets, parabolic refine)
    nint = jnp.arange(N, dtype=jnp.int32)
    nf = nint.astype(jnp.float32)
    ph_int = ((k0 * nint) % fft).astype(jnp.float32) * (-2 * jnp.pi / fft)
    z = rc.mul(buf, rc.exp_i(ph_int))
    u = jnp.linspace(-0.6, 0.6, 85).astype(jnp.float32)
    ph_g = (-2 * jnp.pi / fft) * (u[:, None] * nf[None, :])
    S_g = rc.mul(z[None, :, :], rc.exp_i(ph_g)).sum(axis=1)  # [85, 2]
    P = rc.abs2(S_g)
    i = jnp.clip(jnp.argmax(P), 1, 83)
    den = P[i - 1] - 2 * P[i] + P[i + 1]
    d = jnp.where(den != 0, 0.5 * (P[i - 1] - P[i + 1]) / den, 0.0)
    ustar = u[i] + jnp.clip(d, -1.0, 1.0) * (u[1] - u[0])
    f = (k0.astype(jnp.float32) + ustar) / fft  # cycles/sample

    # two Newton steps on |S(f)|^2 with centered index (f32 conditioning)
    m = nf - (N - 1) / 2.0

    def newton(f, _):
        e = rc.exp_i(-2 * jnp.pi * f * m)
        xe = rc.mul(buf, e)  # [N, 2]
        S = xe.sum(0)  # [2]
        w = 2 * jnp.pi * m
        t = (w[:, None] * xe).sum(0)
        dS = jnp.stack([t[1], -t[0]])  # -j * t
        d2S = -((w ** 2)[:, None] * xe).sum(0)
        g = 2 * (S[0] * dS[0] + S[1] * dS[1])
        h = 2 * (dS[0] ** 2 + dS[1] ** 2) + 2 * (S[0] * d2S[0]
                                                 + S[1] * d2S[1])
        return jnp.where(h < 0, f - g / h, f), None

    f, _ = jax.lax.scan(newton, f, None, length=2)
    e = rc.exp_i(-2 * jnp.pi * f * m)
    amp = rc.mul(buf, e).sum(0) / N  # [2]
    return buf - rc.mul(amp[None, :], rc.conj(e))


def _am_coarse_timing_rc(buf):
    """CP correlation over all 270 candidate timings, rc twin of
    ops/acquire._coarse_timing(am=True) — carrier-tone-subtracted,
    full-band correlation (the reference's pre-sync band filter would
    blind it to MA3; see the divergence note there).  buf: [WINDOW_AM, 2].
    Returns (samperr int32, v_max [2])."""
    from nrsc5_tpu.ops.acquire import _cp_window_idx, _shape_kernel
    fftcp, fft, cp = C.FFTCP_AM, C.FFT_AM, C.CP_AM
    nsym = C.ACQUIRE_SYMBOLS
    fbuf = _am_tone_subtract_rc(buf)
    a = fbuf[:fftcp * nsym].reshape(nsym, fftcp, 2)
    b = fbuf[fft:fft + fftcp * nsym].reshape(nsym, fftcp, 2)
    sums = rc.mul_conj(a, b).sum(axis=0)  # [fftcp, 2]
    widx = jnp.asarray(_cp_window_idx(fftcp, cp))
    kernel = jnp.asarray(_shape_kernel(fft, cp))
    v = (sums[widx] * kernel[None, :, None]).sum(axis=-2)  # [fftcp, 2]
    i_max = jnp.argmax(rc.abs2(v)).astype(jnp.int32)
    return i_max, v[i_max]


@jax.jit
def am_coldstart_block_rc(samples, offset, phase, prev_angle, cfo,
                          coarse_override):
    """One COARSE probe block: CP-correlation timing + smoothed
    fractional CFO + pilot-regression demodulation + sync, in a single
    dispatch.  Returns everything the host lock loop needs.  Probing
    always uses MA1 sideband combining — the reference subcarriers are
    complementary in both modes, so the ref bits (all the lock logic
    reads) come out the same; the mode itself arrives via the bc=0
    control word (find_block_am).

    ``coarse_override`` (int32): when >= 0, demodulate with this timing
    instead of this block's own measurement (the host's consensus latch;
    see ops/sync_am.timing_consensus).  The raw measurement is still
    returned (last element)."""
    window = jax.lax.dynamic_slice(samples, (offset, 0), (WINDOW_AM, 2))
    measured, v = _am_coarse_timing_rc(window)
    samperr = jnp.where(coarse_override >= 0,
                        coarse_override % C.FFTCP_AM, measured)
    angle_diff = rc.angle(rc.mul(v, rc.exp_i(-prev_angle)))
    factor = jnp.where(prev_angle != 0, 0.25, 1.0)
    prev_angle = (prev_angle + angle_diff * factor).astype(jnp.float32)
    spectra, phase, prev_angle, samperr, keep, mag_sums = _am_process_rc(
        window, phase, samperr, prev_angle, cfo)
    out = sync_am_block_rc(spectra, False)
    return (out["ref_bits"], phase, prev_angle, samperr, keep, mag_sums,
            measured)


def cold_start_am_rc(samples_rc, max_blocks: int = 24) -> dict | None:
    """Host-orchestrated AM cold start over an rc capture with unknown
    timing, fractional and integer CFO (MA1 or MA3 — full-band
    acquisition, unlike the reference whose pre-sync band filter cannot
    lock MA3).

    One device dispatch per probe block; needle matching / bc-history
    logic on host, mirroring AMReceiver exactly: block alignment from
    the fuzzy needle offset (find_ref_am), integer CFO from the
    strongest bin near the carrier, lock when the block-count history
    reads 5,6,7,0 — so the locking block IS a frame boundary.

    Returns ``{"offset", "psmi", "ma3", "cfo", "carry"}`` ready for
    :func:`am_chain_scan_rc` / :func:`am_chain_batch_rc` (feed
    ``samples[offset:]``), or None when no lock was found."""
    from nrsc5_tpu.ops.sync_am import (find_block_am, find_ref_am,
                                       timing_consensus)
    fftcp = C.FFTCP_AM
    samples_rc = jnp.asarray(samples_rc)
    phase = jnp.asarray(np.array([1.0, 0.0], np.float32))
    prev_angle = jnp.asarray(0.0, jnp.float32)
    pos, cfo, keep_extra, cfo_wait = 0, 0, 0, 0
    history = 0
    psmi = C.SERVICE_MODE_MA1
    coarse_hist: list[int] = []
    latch, latch_age = -1, 0
    for _ in range(max_blocks):
        if pos + WINDOW_AM > samples_rc.shape[0]:
            return None
        ref_bits, phase, prev_angle, samperr_d, keep, mag_sums, meas = \
            am_coldstart_block_rc(samples_rc, jnp.asarray(pos, jnp.int32),
                                  phase, prev_angle,
                                  jnp.asarray(cfo, jnp.int32),
                                  jnp.asarray(latch, jnp.int32))
        samperr = int(np.asarray(samperr_d))
        # timing-consensus latch (multipath outlier rejection; twin of
        # AMReceiver._process_block)
        coarse_hist.append(int(np.asarray(meas)) % fftcp)
        coarse_hist = coarse_hist[-6:]
        if latch < 0:
            cons = timing_consensus(coarse_hist, fftcp)
            if cons is not None:
                latch, latch_age = cons, 0
        else:
            latch_age += 1
            if latch_age > 16:
                latch, latch_age = -1, 0
                coarse_hist.clear()
        # integer CFO: strongest bin near the carrier
        # (reference: src/acquire.c:209-235)
        lo = C.CENTER_AM - C.PIDS_OUTER_INDEX_AM
        hi = C.CENTER_AM + C.PIDS_OUTER_INDEX_AM + 1
        mags = np.asarray(mag_sums)[lo:hi]
        cfo += int(np.argmax(mags)) + lo - C.CENTER_AM

        ref = np.asarray(ref_bits)
        if cfo_wait == 0:
            off_sym = find_ref_am(ref)
            if off_sym > 0:
                keep_extra = ((C.BLKSZ - off_sym) % C.BLKSZ) * fftcp
                cfo_wait = 8
        else:
            cfo_wait -= 1

        found = find_block_am(ref)
        if found is None:
            history = 0
        else:
            bc, control = found
            if control:
                psmi = control["psmi"] or C.SERVICE_MODE_MA1
            history = ((history << 4) | bc) & 0xFFFFFFFF
        if (history & 0xFFFF) == 0x5670:
            # this block is bc=0: the frame starts at its first symbol.
            # The fused chain demodulates with samperr = FFTCP//2, i.e.
            # expects the first symbol FFTCP//2 past the buffer start.
            start = pos + samperr - fftcp // 2
            if start < 0:
                return None  # lock inside the warm-up guard; no earlier data
            ma3 = psmi == C.SERVICE_MODE_MA3
            carry = am_chain_rc_init_carry(cfo=cfo)._replace(
                prev_angle=prev_angle.astype(jnp.float32))
            return {"offset": start, "psmi": psmi, "ma3": ma3,
                    "cfo": cfo, "carry": carry}
        consumed = WINDOW_AM - (int(np.asarray(keep)) + keep_extra)
        keep_extra = 0
        pos += consumed
    return None
