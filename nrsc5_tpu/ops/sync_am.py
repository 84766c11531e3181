"""AM fine sync: sideband combining, training equalizers, QAM demap.

TPU-first reformulation of the reference AM sync (src/sync.c:612-768): the
whole block is processed as dense [32, 256] array ops with static
(per-service-mode) carrier geometry; the only outputs are hard QAM symbol
codes per partition plus the reference-subcarrier control bits, which the
tiny host state machine (block count history 0x5670, service-mode latch)
consumes.

AM constellation facts (reference: src/sync.c:37-88): QPSK/QAM16/QAM64 with
gray-coded levels at odd half-integers; training rows (5+11c)%32 and
(21+11c)%32 carry fixed points used for one-shot equalization per block.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C

# Interpolated training equalization (default on): the reference equalizes
# each block with ONE mult per column from the SUM of its two training
# symbols (src/sync.c:676-700), so any phase ramp WITHIN the block —
# sample-clock drift, residual CFO — rotates the farthest symbols off the
# QAM64 grid (measured: the reference loses AM lock entirely at ±50 ppm).
# The two training rows are 16 symbols apart; interpolating the mult phase
# between them (midpoint = the reference's averaged phase) tracks the ramp
# and holds AM decode through ±50 ppm.  NRSC5_AM_EQ_INTERP=0 restores the
# reference-equivalent one-shot equalizer.
AM_EQ_INTERP = os.environ.get("NRSC5_AM_EQ_INTERP", "1") != "0"

W = C.PARTITION_WIDTH_AM  # 25
CENTER = C.CENTER_AM

# gray-coded level tables (level index = floor(x) + span/2, clipped)
GRAY4 = np.array([0, 2, 3, 1], np.uint8)
GRAY8 = np.array([0, 4, 6, 2, 3, 7, 5, 1], np.uint8)

TRAIN_QAM64 = 2.5 - 2.5j
TRAIN_QAM16 = 1.5 - 0.5j
TRAIN_QPSK = -0.5 + 0.5j

TRAIN1 = (5 + 11 * np.arange(W)) % 32
TRAIN2 = (21 + 11 * np.arange(W)) % 32


def gray4_map(x):
    idx = jnp.clip(jnp.floor(x).astype(jnp.int32) + 2, 0, 3)
    return jnp.asarray(GRAY4)[idx]


def gray8_map(x):
    idx = jnp.clip(jnp.floor(x).astype(jnp.int32) + 4, 0, 7)
    return jnp.asarray(GRAY8)[idx]


def qam64_map(z):
    return gray8_map(jnp.real(z)) | (gray8_map(jnp.imag(z)) << 3)


def qam16_map(z):
    return gray4_map(jnp.real(z)) | (gray4_map(jnp.imag(z)) << 2)


def qpsk_map(z):
    return ((jnp.real(z) >= 0).astype(jnp.uint8)
            | ((jnp.imag(z) >= 0).astype(jnp.uint8) << 1))


def _wrap_half_pi(d):
    return d - jnp.pi * jnp.round(d / jnp.pi)


def _wrap_pi(d):
    return d - 2 * jnp.pi * jnp.round(d / (2 * jnp.pi))


@functools.partial(jax.jit, static_argnames=("ma3",))
def sync_am_block(spectra, ma3: bool = False):
    """Process one AM L1 block.

    spectra: [32, 256] complex64 fftshifted (bin CENTER = carrier).
    ma3: service mode MA3 (True) vs MA1/hybrid (False) — static geometry.

    Returns dict with:
      ref_bits [32] uint8 — sign bits of the reference subcarrier (imag axis)
      pids [32, 2] uint8 — QAM16 codes (inner, outer) per symbol
      pl/pu/s/t [32*25] uint8 — partition symbol codes in (symbol, col) order
      samperr int32 — sample clock error estimate
    (reference: src/sync.c:612-768)
    """
    buf = spectra  # [sym, bin]
    c = CENTER

    # conjugate the lower sideband (reference: src/sync.c:616-623)
    i = np.arange(C.REF_INDEX_AM, C.MAX_INDEX_AM + 1)
    low = buf[:, c - i]
    buf = buf.at[:, c - i].set(-jnp.conj(low))

    if not ma3:
        # complementary combine into the upper sideband (src/sync.c:625-633)
        j = np.arange(C.REF_INDEX_AM, C.PIDS_OUTER_INDEX_AM + 1)
        buf = buf.at[:, c + j].add(buf[:, c - j])

    ref_bits = (jnp.imag(buf[:, c + C.REF_INDEX_AM]) > 0).astype(jnp.uint8)

    # --- PIDS (QAM16) -------------------------------------------------------
    pids1_bin = c + (C.PIDS_INNER_INDEX_AM if not ma3 else -C.PIDS_INNER_INDEX_AM)
    pids2_bin = c + (C.PIDS_OUTER_INDEX_AM if not ma3 else C.PIDS_INNER_INDEX_AM)
    p1col = buf[:, pids1_bin]
    p2col = buf[:, pids2_bin]
    p1m = 2 * TRAIN_QAM16 / (p1col[8] + p1col[24])
    p2m = 2 * TRAIN_QAM16 / (p2col[8] + p2col[24])
    pids = jnp.stack([qam16_map(p1col * p1m), qam16_map(p2col * p2m)], axis=1)

    # --- partitions ---------------------------------------------------------
    primary = C.OUTER_PARTITION_START_AM if not ma3 else C.INNER_PARTITION_START_AM
    secondary = C.MIDDLE_PARTITION_START_AM
    tertiary = C.INNER_PARTITION_START_AM if not ma3 else C.MIDDLE_PARTITION_START_AM

    col = np.arange(W)
    pl_bins = c - primary - col
    pu_bins = c + primary + col
    s_bins = c + secondary + col
    t_bins = (c + tertiary + col) if not ma3 else (c - tertiary - col)

    t1 = jnp.asarray(TRAIN1)
    t2 = jnp.asarray(TRAIN2)

    def train_mult(bins, nominal):
        cols = buf[:, bins]  # [32, W]
        tr = cols[t1, jnp.arange(W)] + cols[t2, jnp.arange(W)]
        return 2 * nominal / tr  # [W]

    pl_mult = train_mult(pl_bins, TRAIN_QAM64)
    pu_mult = train_mult(pu_bins, TRAIN_QAM64)
    s_mult = train_mult(s_bins, TRAIN_QAM64 if ma3 else TRAIN_QAM16)
    t_mult = train_mult(t_bins, TRAIN_QAM64 if ma3 else TRAIN_QPSK)

    # sample clock error from the phase slope across primary columns
    # (reference: src/sync.c:717-723)
    dp = _wrap_half_pi(jnp.angle(pl_mult[1:]) - jnp.angle(pl_mult[:-1])).sum()
    du = _wrap_half_pi(jnp.angle(pu_mult[1:]) - jnp.angle(pu_mult[:-1])).sum()
    samperr = (dp + du) / (2 * (W - 1)) * C.FFT_AM / (2 * jnp.pi)
    samperr = jnp.round(samperr).astype(jnp.int32)

    if AM_EQ_INTERP:
        # per-symbol-row mult: the averaged mult anchors the phase at the
        # training midpoint (the phasor sum bisects the anchors); the
        # anchor-to-anchor phase delta (16 rows apart, time order) spreads
        # linearly across the block, tracking drift/CFO ramps the one-shot
        # equalizer cannot (see AM_EQ_INTERP note above).  The raw
        # per-column delta is anchored on SINGLE symbols, so multipath
        # nulls make individual columns noisy — but the physical ramp is
        # exactly linear in column (timing drift ∝ bin index, residual
        # CFO constant), so a weighted linear fit across the partition's
        # 25 columns (weights = anchor magnitudes: nulled columns opt
        # out) recovers the ramp without the noise.
        a_lo = jnp.minimum(t1, t2)  # anchors are exactly 16 rows apart
        ar = jnp.arange(W)
        u = (jnp.arange(32)[:, None] - a_lo[None, :] - 8) / 16.0  # [32, W]
        colf = jnp.arange(W, dtype=jnp.float32)

        def rows_mult(bins, base):
            cols = buf[:, bins]
            lo, hi = cols[a_lo, ar], cols[a_lo + 16, ar]
            dphi = _wrap_pi(jnp.angle(lo) - jnp.angle(hi))  # [W]
            w = jnp.abs(lo) * jnp.abs(hi) + 1e-12
            wsum = w.sum()
            cbar = (w * colf).sum() / wsum
            dbar = (w * dphi).sum() / wsum
            b = (w * (colf - cbar) * (dphi - dbar)).sum() \
                / ((w * (colf - cbar) ** 2).sum() + 1e-12)
            fit = dbar + b * (colf - cbar)  # [W]
            return base[None, :] * jnp.exp(1j * u * fit[None, :])

        pl_eq = buf[:, pl_bins] * rows_mult(pl_bins, pl_mult)
        pu_eq = buf[:, pu_bins] * rows_mult(pu_bins, pu_mult)
        s_eq = buf[:, s_bins] * rows_mult(s_bins, s_mult)
        t_eq = buf[:, t_bins] * rows_mult(t_bins, t_mult)
    else:
        pl_eq = buf[:, pl_bins] * pl_mult[None, :]
        pu_eq = buf[:, pu_bins] * pu_mult[None, :]
        s_eq = buf[:, s_bins] * s_mult[None, :]
        t_eq = buf[:, t_bins] * t_mult[None, :]

    if not ma3:
        pl_c, pu_c = qam64_map(pl_eq), qam64_map(pu_eq)
        s_c, t_c = qam16_map(s_eq), qpsk_map(t_eq)
    else:
        pl_c, pu_c = qam64_map(pl_eq), qam64_map(pu_eq)
        s_c, t_c = qam64_map(s_eq), qam64_map(t_eq)

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
# Host-side reference-subcarrier control logic (tiny): needle matching and
# block-count extraction (reference: src/sync.c:209-258).
# ---------------------------------------------------------------------------

def timing_consensus(hist, modulo: int, tol: int = 2, need: int = 3):
    """Circular mode of recent coarse-timing measurements.

    Returns the member of ``hist`` supported by >= ``need`` measurements
    within ±``tol`` (circularly, modulo ``modulo``), or None.  Used by the
    AM receivers to latch a consistent symbol timing under strong
    multipath, where individual CP-correlation blocks throw outliers
    (the echo lag and random lags; see ops/acquire._am_tone_subtract)."""
    best, best_count = None, 0
    for cand in hist:
        count = sum(1 for h in hist
                    if min((h - cand) % modulo, (cand - h) % modulo) <= tol)
        if count > best_count:
            best, best_count = cand, count
    return best if best_count >= need else None


def find_ref_am(bits: np.ndarray) -> int:
    """Fuzzy cyclic match of the AM sync needle (first 23 positions);
    returns the offset or -1 (reference: src/sync.c:243-258)."""
    needle = np.asarray(C.AM_REF_SIGNS_FIXED[:23], np.int64)
    known = needle >= 0
    for n in range(C.BLKSZ):
        seg = bits[(n + np.arange(23)) % C.BLKSZ]
        if np.all(seg[known] == needle[known]):
            return n
    return -1


def find_block_am(bits: np.ndarray):
    """Exact needle + parity check; returns (bc, control) or None
    (reference: src/sync.c:209-241)."""
    d = np.asarray(bits, np.int64)
    needle = np.asarray(C.AM_REF_SIGNS_FIXED, np.int64)
    known = needle >= 0
    if not np.all(d[known] == needle[known]):
        return None
    if d[7] ^ d[8]:
        return None
    if d[10] ^ d[11] ^ d[12] ^ d[13]:
        return None
    if d[15] ^ d[16] ^ d[17] ^ d[18] ^ d[19] ^ d[20]:
        return None
    if np.bitwise_xor.reduce(d[23:32]):
        return None
    bc = (d[17] << 2) | (d[18] << 1) | d[19]
    control = {}
    if bc == 0:
        control = {
            "psmi": (d[26] << 4) | (d[27] << 3) | (d[28] << 2)
                    | (d[29] << 1) | d[30],
            "pli": int(d[7]), "hppi": int(d[11]), "aabi": int(d[12]),
            "rdbi": int(d[15]),
        }
    return int(bc), control
