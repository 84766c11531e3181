"""Device-batched HDC -> PCM reconstruction (filterbank + SBR on TPU).

The host decoder (hdc_decoder/sbr) runs the whole reconstruction in
numpy at ~4.3 ms/packet/core — decoding audio for a 16-station served
fleet (~344 packets/s) saturates a core while the QMF banks and (I)MDCT
are dense linear algebra begging for the MXU.  This module splits the
codec at the natural line:

* host (cheap, branchy): bitstream parse, huffman, dequant, M/S-IS,
  TNS, PNS, SBR grid/envelope bookkeeping (``HDCDecoder.parse``);
* device (one jitted dispatch per batch of programs x packets): IMDCT
  as basis matmuls, windowing, overlap-add, the 32-band QMF analysis
  and 64-band synthesis as strided-window matmuls, the HF generator
  (batched covariance LPC + patch gather + chirp) and the HF adjuster
  (envelope/noise/sinusoid gains with limiter+boost) — everything in
  float32 with I/Q as a trailing [..., 2] axis (the axon backend has no
  complex support).

Carried per-lane state (overlap, QMF histories, LPC tail) is a device
pytree, so consecutive batches are bit-consistent with a streaming
decoder.  `test_audio_batch.py` pins PCM agreement with the host
decoder; `bench.py --mode audio` gates the throughput row on it.

Reference analog: FAAD2 decoding per subscribed program on the host
(src/output.c:126-163) — this is the TPU-native replacement.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nrsc5_tpu.audio import aac_core as A
from nrsc5_tpu.audio import aac_tables as T
from nrsc5_tpu.audio import sbr as S
from nrsc5_tpu.audio.hdc_decoder import HDCDecoder

NSLOT = S.NUM_SLOTS  # 32 QMF subsamples per packet
MAXENV = 5


# ----------------------------------------------------------------------
# static kernels
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _imdct_long() -> np.ndarray:
    # time = (2/n)·B@X, then filterbank 0.5 scale -> (1/n)·B
    return (A._mdct_basis(A.FRAME_LEN) / A.FRAME_LEN).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _imdct_short() -> np.ndarray:
    return (A._mdct_basis(A.SHORT_LEN) / A.SHORT_LEN).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _qmf_analysis_kernel() -> np.ndarray:
    """[320, 64] real kernel: X[s,k] = Σ_τ ext[32s+τ]·KA[τ,k]
    (window fold + modulation combined; KA[:, :32]=re, [:, 32:]=im)."""
    win = T.SBR_QMF_WINDOW_US[::2].astype(np.float64) * 2.0
    mod = S._analysis_mod()  # [64, 32]
    ka = np.zeros((320, 64))
    for tau in range(320):
        j = 319 - tau
        m = mod[j % 64]  # [32]
        ka[tau, :32] = win[j] * m.real
        ka[tau, 32:] = win[j] * m.imag
    return ka.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _synthesis_mod_ri():
    sm = S._synthesis_mod()  # [64, 128]
    return (sm.real.astype(np.float32) / 64.0,
            sm.imag.astype(np.float32) / 64.0)


@functools.lru_cache(maxsize=None)
def _synthesis_taps():
    """cidx [10, 64] int32 / W [10, 64] f32: out_block[s, i] =
    Σ_d V[s-d, cidx[d, i]]·W[d, i] (the v-history gather of
    sbr.QMFSynthesis as a dense tap structure)."""
    win = T.SBR_QMF_WINDOW_US.astype(np.float64)
    cidx = np.zeros((10, 64), np.int32)
    w = np.zeros((10, 64))
    i = np.arange(64)
    for d in range(10):
        if d % 2 == 0:
            n = d // 2
            cidx[d] = i
            w[d] = win[128 * n + i]
        else:
            n = (d - 1) // 2
            cidx[d] = 64 + i
            w[d] = win[128 * n + 64 + i]
    return cidx, w.astype(np.float32)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


@functools.lru_cache(maxsize=None)
def _long_window(seq: int, shape: int, prev: int) -> np.ndarray:
    return A.build_window(seq, shape, prev).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _short_windows(shape: int, prev: int) -> np.ndarray:
    wl = A.window(prev, A.SHORT_LEN)
    wc = A.window(shape, A.SHORT_LEN)
    out = np.empty((8, 256), np.float32)
    for w in range(8):
        out[w] = np.concatenate([wl[:128] if w == 0 else wc[:128],
                                 wc[128:]])
    return out


# MDCT windows are pure functions of (window_sequence, shape, prev_shape)
# — 2 bits each — yet uploading them per (lane, packet) was 8.4 MB of the
# 12 MB dispatch payload at 64 lanes (70% of the transfer-bound audio
# dispatch on the tunneled chip).  They live on device as small constant
# LUTs instead; the host uploads one uint8 index per (lane, packet).
# Index 0 is the all-zero window (inactive / corrupt-packet lanes),
# mirroring the old zero-filled default bit-exactly.

def _long_window_index(seq: int, shape: int, prev: int) -> int:
    li = {A.ONLY_LONG: 0, A.LONG_START: 1, A.LONG_STOP: 2}[seq]
    return 1 + li * 4 + shape * 2 + prev


@functools.lru_cache(maxsize=1)
def _long_window_lut() -> np.ndarray:
    lut = np.zeros((13, 2048), np.float32)
    for seq in (A.ONLY_LONG, A.LONG_START, A.LONG_STOP):
        for shape in (0, 1):
            for prev in (0, 1):
                lut[_long_window_index(seq, shape, prev)] = \
                    _long_window(seq, shape, prev)
    return lut


def _short_window_index(shape: int, prev: int) -> int:
    return 1 + shape * 2 + prev


@functools.lru_cache(maxsize=1)
def _short_window_lut() -> np.ndarray:
    lut = np.zeros((5, 8, 256), np.float32)
    for shape in (0, 1):
        for prev in (0, 1):
            lut[_short_window_index(shape, prev)] = \
                _short_windows(shape, prev)
    return lut


# ----------------------------------------------------------------------
# the jitted device stage
# ----------------------------------------------------------------------
def _make_device_fn(ft: S.FreqTables, lim_gain: float, interpol: bool,
                    smooth: bool = False, cap_long: int = 1024,
                    cap_short: int = 128):
    """``cap_long`` / ``cap_short`` bound the uploaded spectrum (long
    frames / per short window): HDC core spectra are band-limited at
    the SBR crossover, so the tail bins are structurally zero — the
    host verifies and uploads only the live prefix (round-5 serve-audio
    transfer ablation), and the IMDCT basis is sliced to match (exact,
    not an approximation)."""
    kx, m = ft.kx, ft.m
    n_low = min(kx, 32)
    # band indicator matrices for bs_interpol_freq=0 gain averaging
    # (host analog: sbr.py adjust, §4.6.18.7.2 — per-envelope-resolution
    # band means instead of per-bin gains)
    def _seg(bands, nb):
        M = np.zeros((nb, m), np.float32)
        for b in range(nb):
            M[b, int(bands[b]) - kx:int(bands[b + 1]) - kx] = 1.0
        return M
    seg_hi = _seg(ft.f_high, ft.n_high)
    seg_lo = _seg(ft.f_low, ft.n_low)
    w_hi = np.maximum(seg_hi.sum(axis=1), 1.0).astype(np.float32)
    w_lo = np.maximum(seg_lo.sum(axis=1), 1.0).astype(np.float32)
    src_idx = np.full(m, 0, np.int32)
    src_ok = np.zeros(m, np.float32)
    for (t, src0, length) in ft.patches:
        for q in range(length):
            tgt = t + q - kx
            p = src0 + q
            if 0 <= tgt < m and p < 32:
                src_idx[tgt] = p
                src_ok[tgt] = 1.0
    lim_seg = np.zeros((ft.n_lim, m), np.float32)
    for lb in range(ft.n_lim):
        lim_seg[lb, int(ft.f_lim[lb]):int(ft.f_lim[lb + 1])] = 1.0
    noise_tab = np.stack([S.NOISE_TABLE.real, S.NOISE_TABLE.imag],
                         -1).astype(np.float32)  # [512, 2]
    phase_tab = np.stack([np.array([1, 0, -1, 0], np.float32),
                          np.array([0, 1, 0, -1], np.float32)], -1)

    # one-hot sinusoid placement rows (band b -> its center bin)
    hb_lo = ft.f_high[:-1].astype(int) - kx
    hb_mid = (hb_lo + (ft.f_high[1:].astype(int) - kx)) // 2
    hb_onehot = np.zeros((ft.n_high, m), np.float32)
    for b in range(ft.n_high):
        hb_onehot[b, int(hb_mid[b])] = 1.0
    seg_noise = _seg(ft.f_noise, ft.n_q)

    def fn(state, inp):
        # ---- shapes: lanes N, packets K --------------------------------
        spec_l = inp["spec_long"]              # [N, K, cap_long]
        spec_s = inp["spec_short"]             # [N, K, 8, cap_short]
        N, K = spec_l.shape[:2]
        S_tot = K * NSLOT

        # ---- 1) core filterbank ---------------------------------------
        BL = jnp.asarray(_imdct_long()[:, :cap_long])  # [2048, capL]
        BS = jnp.asarray(_imdct_short()[:, :cap_short])  # [256, capS]
        win_long = jnp.asarray(_long_window_lut())[inp["win_long_idx"]]
        win_short = jnp.asarray(_short_window_lut())[inp["win_short_idx"]]
        long_buf = jnp.einsum("nkf,tf->nkt", spec_l, BL,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        long_buf = long_buf * win_long         # [N, K, 2048]
        sh = jnp.einsum("nkwf,tf->nkwt", spec_s, BS,
                        preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        sh = sh * win_short                    # [N, K, 8, 256]
        short_buf = jnp.zeros_like(long_buf)
        for w in range(8):
            o = A.SHORT_OFF + w * A.SHORT_LEN
            short_buf = short_buf.at[..., o:o + 256].add(sh[:, :, w])
        buf = jnp.where(inp["short"][..., None], short_buf, long_buf)
        # overlap-add
        tails = jnp.concatenate([state["overlap"][:, None],
                                 buf[:, :-1, 1024:]], axis=1)
        core = buf[..., :1024] + tails         # [N, K, 1024]
        new_overlap = buf[:, -1, 1024:]

        # ---- 2) QMF32 analysis ----------------------------------------
        ext = jnp.concatenate([state["qa_hist"],
                               core.reshape(N, K * 1024)], axis=1)
        idx = (np.arange(S_tot)[:, None] * 32
               + np.arange(320)[None, :])      # [S, 320] static
        wins = ext[:, idx]                     # [N, S, 320]
        KA = jnp.asarray(_qmf_analysis_kernel())
        xl = jnp.einsum("nst,tk->nsk", wins, KA,
                        preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        xlr, xli = xl[..., :32], xl[..., 32:]  # [N, S, 32]
        new_qa_hist = ext[:, -288:]

        xlr_k = xlr.reshape(N, K, NSLOT, 32)
        xli_k = xli.reshape(N, K, NSLOT, 32)

        # ---- 3) HF generator: covariance LPC per (lane, packet, band) --
        tr = jnp.concatenate([state["tail_r"][:, None],
                              xlr_k[:, :-1, -2:]], axis=1)  # [N, K, 2, 32]
        ti = jnp.concatenate([state["tail_i"][:, None],
                              xli_k[:, :-1, -2:]], axis=1)
        vr = jnp.concatenate([tr, xlr_k], axis=2)  # [N, K, 34, 32]
        vi = jnp.concatenate([ti, xli_k], axis=2)
        new_tail_r, new_tail_i = xlr_k[:, -1, -2:], xli_k[:, -1, -2:]

        v0r, v0i = vr[:, :, 2:], vi[:, :, 2:]      # x[n]
        v1r, v1i = vr[:, :, 1:-1], vi[:, :, 1:-1]  # x[n-1]
        v2r, v2i = vr[:, :, :-2], vi[:, :, :-2]    # x[n-2]

        def cdot(ar, ai, br, bi):  # Σ conj(a)·b over the slot axis
            re = (ar * br + ai * bi).sum(axis=2)
            im = (ar * bi - ai * br).sum(axis=2)
            return re, im

        p01r, p01i = cdot(v1r, v1i, v0r, v0i)
        p11 = (v1r * v1r + v1i * v1i).sum(axis=2)
        p02r, p02i = cdot(v2r, v2i, v0r, v0i)
        p12r, p12i = cdot(v2r, v2i, v1r, v1i)
        p22 = (v2r * v2r + v2i * v2i).sum(axis=2)
        d = p22 * p11 - (p12r * p12r + p12i * p12i) / 1.000001
        d_ok = jnp.abs(d) > S.EPS
        dd = jnp.where(d_ok, d, 1.0)
        a1r = jnp.where(d_ok, (p01r * p12r - p01i * p12i
                               - p02r * p11) / dd, 0.0)
        a1i = jnp.where(d_ok, (p01r * p12i + p01i * p12r
                               - p02i * p11) / dd, 0.0)
        p_ok = jnp.abs(p11) > S.EPS
        pp = jnp.where(p_ok, p11, 1.0)
        # alpha0 = -(p01 + alpha1·conj(p12)) / p11
        t0r, t0i = _cmul(a1r, a1i, p12r, -p12i)
        a0r = jnp.where(p_ok, -(p01r + t0r) / pp, 0.0)
        a0i = jnp.where(p_ok, -(p01i + t0i) / pp, 0.0)
        # host guard is on the COMPLEX magnitude (sbr.py: abs(alpha)>=4)
        big = (a0r * a0r + a0i * a0i >= 16.0) | \
              (a1r * a1r + a1i * a1i >= 16.0)
        a0r = jnp.where(big, 0.0, a0r)
        a0i = jnp.where(big, 0.0, a0i)
        a1r = jnp.where(big, 0.0, a1r)
        a1i = jnp.where(big, 0.0, a1i)
        # band 0 and bands >= kx+1 carry no predictor (host: range(1, kx+1))
        bmask = np.zeros(32, np.float32)
        bmask[1:min(kx + 1, 32)] = 1.0
        a0r, a0i = a0r * bmask, a0i * bmask
        a1r, a1i = a1r * bmask, a1i * bmask

        # patch: x_high[t, j] = v0[src] + b·a0[src]·v1[src] + b²·a1[src]·v2[src]
        bwj = inp["bwj"]                      # [N, K, m] chirp per target
        si = jnp.asarray(src_idx)
        ok = jnp.asarray(src_ok)
        g0r, g0i = a0r[..., si], a0i[..., si]  # [N, K, m]
        g1r, g1i = a1r[..., si], a1i[..., si]
        sv0r, sv0i = v0r[..., si], v0i[..., si]  # [N, K, 32, m]
        sv1r, sv1i = v1r[..., si], v1i[..., si]
        sv2r, sv2i = v2r[..., si], v2i[..., si]
        c1r, c1i = bwj * g0r, bwj * g0i
        bw2 = bwj * bwj
        c2r, c2i = bw2 * g1r, bw2 * g1i
        xhr = sv0r + (c1r[:, :, None] * sv1r - c1i[:, :, None] * sv1i) \
            + (c2r[:, :, None] * sv2r - c2i[:, :, None] * sv2i)
        xhi = sv0i + (c1r[:, :, None] * sv1i + c1i[:, :, None] * sv1r) \
            + (c2r[:, :, None] * sv2i + c2i[:, :, None] * sv2r)
        xhr, xhi = xhr * ok, xhi * ok          # [N, K, 32, m]

        # ---- 4) HF adjust ----------------------------------------------
        # envelope quantities arrive in BAND space (≤ n_high values per
        # envelope instead of m per-bin values) and expand on device via
        # the static band→bin indicator matmuls — the host used to do
        # this expansion and upload the per-bin arrays, 4× the bytes
        # (round-5 serve-audio transfer ablation)
        env_seg = inp["env_seg"].astype(jnp.float32)  # [N,K,NSLOT,MAXENV]
        res = inp["freq_res"].astype(jnp.float32)[..., None]
        SH, SL = jnp.asarray(seg_hi), jnp.asarray(seg_lo)
        eb = inp["e_bands"]                    # [N, K, MAXENV, n_high]
        e_orig = res * jnp.einsum(
            "nkeb,bm->nkem", eb, SH,
            precision=jax.lax.Precision.HIGHEST) \
            + (1.0 - res) * jnp.einsum(
                "nkeb,bm->nkem", eb[..., :ft.n_low], SL,
                precision=jax.lax.Precision.HIGHEST)
        q_orig = jnp.einsum("nkeb,bm->nkem", inp["q_bands"],
                            jnp.asarray(seg_noise),
                            precision=jax.lax.Precision.HIGHEST)
        act = inp["harm_act"].astype(jnp.float32)  # [N, K, MAXENV, n_high]
        s_mapped = jnp.einsum("nkeb,bm->nkem", act, SH,
                              precision=jax.lax.Precision.HIGHEST)
        s_bins = jnp.einsum("nkeb,bm->nkem", act, jnp.asarray(hb_onehot),
                            precision=jax.lax.Precision.HIGHEST)
        delta_e = inp["delta_e"].astype(jnp.float32)  # [N, K, MAXENV]

        e2 = xhr * xhr + xhi * xhi             # [N, K, 32, m]
        cnt = env_seg.sum(axis=2)              # [N, K, MAXENV]
        e_curr = jnp.einsum("nkse,nksm->nkem", env_seg, e2,
                            preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST) \
            / jnp.maximum(cnt, 1.0)[..., None]
        if not interpol:
            # bs_interpol_freq=0: flatten the energy estimate over each
            # band of the envelope's resolution so gains are per-band
            HH, HL = jnp.asarray(seg_hi), jnp.asarray(seg_lo)
            ebh = jnp.einsum("nkem,bm->nkeb", e_curr, HH,
                             precision=jax.lax.Precision.HIGHEST) \
                / jnp.asarray(w_hi)
            e_hi = jnp.einsum("nkeb,bm->nkem", ebh, HH,
                              precision=jax.lax.Precision.HIGHEST)
            ebl = jnp.einsum("nkem,bm->nkeb", e_curr, HL,
                             precision=jax.lax.Precision.HIGHEST) \
                / jnp.asarray(w_lo)
            e_lo = jnp.einsum("nkeb,bm->nkem", ebl, HL,
                              precision=jax.lax.Precision.HIGHEST)
            res = inp["freq_res"][..., None]   # [N, K, MAXENV, 1]
            e_curr = res * e_hi + (1.0 - res) * e_lo

        q_frac = q_orig / (1.0 + q_orig)
        gain = jnp.where(
            s_mapped > 0,
            jnp.sqrt(e_orig * q_frac / (1.0 + e_curr)),
            jnp.sqrt(e_orig / ((1.0 + e_curr)
                               * (1.0 + delta_e[..., None] * q_orig))))
        q_m = jnp.sqrt(e_orig * q_frac)
        s_m = jnp.where(s_bins > 0,
                        jnp.sqrt(e_orig / (1.0 + q_orig)), 0.0)

        LS = jnp.asarray(lim_seg)              # [n_lim, m]
        eo_sum = jnp.einsum("lm,nkem->nkel", LS, e_orig,
                           precision=jax.lax.Precision.HIGHEST)
        ec_sum = jnp.einsum("lm,nkem->nkel", LS, e_curr,
                           precision=jax.lax.Precision.HIGHEST)
        g_max_l = jnp.minimum(
            lim_gain * jnp.sqrt((S.EPS + eo_sum) / (S.EPS + ec_sum)), 1e10)
        g_max = jnp.einsum("lm,nkel->nkem", LS, g_max_l,
                           precision=jax.lax.Precision.HIGHEST)
        clipped = gain > g_max
        q_m = jnp.where(clipped, q_m * g_max / jnp.maximum(gain, S.EPS),
                        q_m)
        gain = jnp.minimum(gain, g_max)
        got = gain * gain * e_curr \
            + delta_e[..., None] * (q_m * q_m * (1.0 - s_mapped)) \
            + s_m * s_m
        got_sum = jnp.einsum("lm,nkem->nkel", LS, got,
                           precision=jax.lax.Precision.HIGHEST)
        boost_l = jnp.minimum(
            jnp.sqrt((S.EPS + eo_sum) / (S.EPS + got_sum)), S.MAX_BOOST)
        boost = jnp.einsum("lm,nkel->nkem", LS, boost_l,
                           precision=jax.lax.Precision.HIGHEST)
        gain, q_m, s_m = gain * boost, q_m * boost, s_m * boost

        # expand per-envelope values to slots
        gain_s = jnp.einsum("nkse,nkem->nksm", env_seg, gain,
                           precision=jax.lax.Precision.HIGHEST)
        sm_s = jnp.einsum("nkse,nkem->nksm", env_seg, s_m,
                          precision=jax.lax.Precision.HIGHEST)
        cover = env_seg.sum(axis=3)            # [N, K, NSLOT]

        if smooth:
            # bs_smoothing_mode=0 (§4.6.18.7.5): 5-tap h_smooth over the
            # per-slot raw gain/noise trajectories, 4 slots of carried
            # history, gate after filtering (host twin:
            # sbr.SBRDecoder._hf_adjust)
            q_raw_s = jnp.einsum("nkse,nkem->nksm", env_seg, q_m,
                                 precision=jax.lax.Precision.HIGHEST)
            gate_s = jnp.einsum("nkse,nkem->nksm", env_seg,
                                delta_e[..., None] * (1.0 - s_mapped),
                                precision=jax.lax.Precision.HIGHEST)
            HSM = S.H_SMOOTH
            gt = jnp.concatenate(
                [state["g_hist"][:, :, :m],
                 gain_s.reshape(N, S_tot, m)], axis=1)
            qt = jnp.concatenate(
                [state["q_hist"][:, :, :m],
                 q_raw_s.reshape(N, S_tot, m)], axis=1)
            g_f = sum(HSM[j] * gt[:, 4 - j:4 - j + S_tot]
                      for j in range(5)).reshape(N, K, NSLOT, m)
            q_f = sum(HSM[j] * qt[:, 4 - j:4 - j + S_tot]
                      for j in range(5)).reshape(N, K, NSLOT, m)
            pad = jnp.zeros((N, 4, 64 - m), jnp.float32)
            new_g_hist = jnp.concatenate([gt[:, -4:], pad], axis=2)
            new_q_hist = jnp.concatenate([qt[:, -4:], pad], axis=2)
            # transient envelopes bypass the filter (delta_e is exactly
            # the per-envelope transient indicator; history still
            # advances with the raw trajectory) — host twin semantics
            ok_s = jnp.einsum("nkse,nke->nks", env_seg, delta_e,
                              precision=jax.lax.Precision.HIGHEST)[
                ..., None]
            gain_s = ok_s * g_f + (1.0 - ok_s) * gain_s
            qm_s = gate_s * (ok_s * q_f + (1.0 - ok_s) * q_raw_s)
        else:
            qm_s = jnp.einsum(
                "nkse,nkem->nksm", env_seg,
                delta_e[..., None] * q_m * (1.0 - s_mapped),
                precision=jax.lax.Precision.HIGHEST)

        # noise phasors from the running index (advances on covered slots)
        nstart = inp["noise_start"]            # [N, K, NSLOT] int32
        nidx = (nstart[..., None] + 1
                + jnp.arange(m, dtype=jnp.int32)) & 511
        NT = jnp.asarray(noise_tab)
        nz = NT[nidx]                          # [N, K, NSLOT, m, 2]
        # sinusoid phase i^((slot + j) & 3)
        pidx = (jnp.arange(NSLOT, dtype=jnp.int32)[:, None]
                + jnp.arange(m, dtype=jnp.int32)[None, :]) & 3
        PT = jnp.asarray(phase_tab)
        ph = PT[pidx]                          # [NSLOT, m, 2]

        yr = xhr * gain_s + qm_s * nz[..., 0] + sm_s * ph[..., 0]
        yi = xhi * gain_s + qm_s * nz[..., 1] + sm_s * ph[..., 1]
        yr = yr * cover[..., None]
        yi = yi * cover[..., None]

        # ---- 5) assemble X and synthesize ------------------------------
        Xr = jnp.zeros((N, K, NSLOT, 64), jnp.float32)
        Xi = jnp.zeros((N, K, NSLOT, 64), jnp.float32)
        nlow_mask = inp["nlow"]                # [N, K, 32] (0/1)
        Xr = Xr.at[..., :32].set(xlr_k * nlow_mask[:, :, None, :])
        Xi = Xi.at[..., :32].set(xli_k * nlow_mask[:, :, None, :])
        Xr = Xr.at[..., kx:kx + m].add(yr)
        Xi = Xi.at[..., kx:kx + m].add(yi)

        SMr, SMi = _synthesis_mod_ri()
        V = jnp.einsum("nksb,bt->nkst", Xr.reshape(N, K, NSLOT, 64),
                       jnp.asarray(SMr),
                       preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST) \
            - jnp.einsum("nksb,bt->nkst", Xi, jnp.asarray(SMi),
                         preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        V = V.reshape(N, S_tot, 128)
        Vx = jnp.concatenate([state["syn_hist"], V], axis=1)
        cidx, W10 = _synthesis_taps()
        out = jnp.zeros((N, S_tot, 64), jnp.float32)
        for dtap in range(10):
            rows = Vx[:, 9 - dtap:9 - dtap + S_tot]     # [N, S, 128]
            out = out + rows[:, :, cidx[dtap]] * W10[dtap]
        new_syn_hist = Vx[:, -9:]

        # quantize to int16 ON DEVICE: halves the PCM device->host bytes
        # (the antenna->PCM serving path is tunnel-transfer-bound), and is
        # bit-identical to the former host-side round/clip/cast — float32
        # represents every |x| <= 32768 integer exactly and both rounders
        # are round-half-even
        pcm = out.reshape(N, K, NSLOT * 64)
        pcm = jnp.clip(jnp.round(pcm), -32768, 32767).astype(jnp.int16)
        new_state = {"overlap": new_overlap, "qa_hist": new_qa_hist,
                     "syn_hist": new_syn_hist,
                     "tail_r": new_tail_r, "tail_i": new_tail_i}
        if smooth:  # trajectory carry only exists for smoothing headers
            new_state["g_hist"] = new_g_hist
            new_state["q_hist"] = new_q_hist
        return new_state, pcm

    return fn


# ----------------------------------------------------------------------
# host orchestration
# ----------------------------------------------------------------------
class BatchedAudioDecoder:
    """N-lane streaming HDC decoder with one device dispatch per batch.

    Lanes are (program, channel) pairs: stereo programs occupy 2 lanes,
    mono packets are mirrored into both.  Call ``decode(packets)`` with
    a list of per-program packet lists (equal length K); returns int16
    PCM [programs, K*2048, 2].  One SBR header is served per batch
    (sticky across batches — the served-fleet case); a packet whose own
    header differs falls back to zeroed HF (upsample-only) for that
    packet.  Headers with ``bs_interpol_freq=0`` run the per-band
    averaged-gain path on device (§4.6.18.7.2).
    """

    def __init__(self, n_programs: int, backend=None):
        self.n = n_programs
        self.lanes = 2 * n_programs
        self._parsers = [HDCDecoder() for _ in range(n_programs)]
        self._bw = np.zeros((self.lanes, 5))
        self._noise_index = np.zeros(self.lanes, np.int64)
        self._prev_shape = np.zeros(self.lanes, np.int32)
        self._prev_harm = [None] * self.lanes
        # prev frame ended on a transient (l_A == n_env): envelope 0 of
        # the next frame counts as transient (host: _prev_la_end)
        self._la_end = np.zeros(self.lanes, bool)
        self._ft = None
        self._fn = None
        self._state = None
        self._backend = backend
        self._K = None
        # sticky grow-only spectrum-upload caps (round-5 transfer cut):
        # HDC core spectra are band-limited at the SBR crossover, so
        # only the live prefix is uploaded; a batch whose content
        # exceeds the cap grows it (bucketed) and recompiles once
        self._cap_long = 384
        self._cap_short = 48

    # ------------------------------------------------------------------
    def _ensure(self, ft: S.FreqTables, hdr: S.SbrHeader, K: int):
        # rebuild the device fn when the batch size OR the SBR header
        # changes (different headers -> different band structure / m);
        # the carried streaming state is shape-independent of both, so
        # it persists across rebuilds (two K=4 calls == one K=8 call)
        key = (K, self._cap_long, self._cap_short,
               hdr.amp_res, hdr.start_freq, hdr.stop_freq,
               hdr.xover_band, hdr.freq_scale, hdr.alter_scale,
               hdr.noise_bands, hdr.limiter_bands, hdr.limiter_gains,
               hdr.interpol_freq, hdr.smoothing_mode)
        if getattr(self, "_key", None) != key:
            self._key = key
            self._ft = ft
            self._hdr = hdr
            # static prep maps: band rows -> per-bin vectors as matmuls
            m, kx = ft.m, ft.kx

            def seg(bands, nb):
                M = np.zeros((nb, m), np.float32)
                for b in range(nb):
                    M[b, int(bands[b]) - kx:int(bands[b + 1]) - kx] = 1.0
                return M
            self._b2b_high = seg(ft.f_high, ft.n_high)
            self._b2b_low = seg(ft.f_low, ft.n_low)
            self._b2b_noise = seg(ft.f_noise, ft.n_q)
            # high-band center bins (sinusoid placement)
            self._hb_lo = ft.f_high[:-1].astype(int) - kx
            self._hb_hi = ft.f_high[1:].astype(int) - kx
            self._hb_mid = (self._hb_lo + self._hb_hi) // 2
            # per-patch-target chirp noise-band index
            nb_t = np.zeros(m, np.int64)
            for (t, src0, length) in ft.patches:
                for q in range(length):
                    tgt = t + q - kx
                    if 0 <= tgt < m:
                        nb_t[tgt] = min(max(int(np.searchsorted(
                            ft.f_noise, t + q, "right") - 1), 0), 4)
            self._nb_of_tgt = nb_t
            dev_fn = _make_device_fn(
                ft, S.LIM_GAINS[hdr.limiter_gains],
                interpol=bool(hdr.interpol_freq),
                smooth=not hdr.smoothing_mode,
                cap_long=self._cap_long, cap_short=self._cap_short)
            kwargs = {}
            if self._backend is not None:
                kwargs["backend"] = self._backend
            self._fn = jax.jit(dev_fn, donate_argnums=(0,), **kwargs)
            self._K = K

    def _reconcile_state(self, smooth: bool, hdr_key: tuple):
        """Bring the carried device state in line with one prepared
        batch's header, immediately before its dispatch.  Runs on the
        DISPATCH side of the prepare/dispatch pipeline split (round-5):
        :meth:`prepare` may rebuild the jitted fn for the NEXT batch
        while a previous dispatch is still in flight, so state surgery
        here — not in :meth:`_ensure` — keeps the donated state dict
        owned by exactly one thread."""
        import jax.numpy as jnp
        N = self.lanes
        z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
        if self._state is None:  # first dispatch only — state persists
            self._state = {
                "overlap": z(N, 1024), "qa_hist": z(N, 288),
                "syn_hist": z(N, 9, 128),
                "tail_r": z(N, 2, 32), "tail_i": z(N, 2, 32)}
        # smoothing-header trajectory carry: present only when the
        # batch header smooths (keeps the default path's eagerly
        # shipped state 64 KB smaller per dispatch); zeroed on a
        # header change like the host set_header, persisted across
        # pure batch-size / spectrum-cap rebuilds
        if hdr_key != getattr(self, "_hdr_key", None):
            self._hdr_key = hdr_key
            if getattr(self, "_restored", False):
                # first dispatch after restore(): keep the restored
                # trajectories, just reconcile presence
                self._restored = False
            else:
                self._state.pop("g_hist", None)
                self._state.pop("q_hist", None)
            if smooth:
                self._state.setdefault("g_hist", z(N, 4, 64))
                self._state.setdefault("q_hist", z(N, 4, 64))
            else:
                self._state.pop("g_hist", None)
                self._state.pop("q_hist", None)

    _BW_TAB = np.array([0.0, 0.75, 0.9, 0.98])

    def _prep_sbr(self, lane: int, d: S.SbrData | None, ft, out, k):
        """Fill one lane-packet's SBR arrays from parsed data (mirrors
        sbr.SBRDecoder.process bookkeeping on the host side; fully
        vectorized — this runs per packet on the serving path)."""
        m = ft.m
        if d is None:
            # no SBR payload: HF stays zero, low band keeps 32 bands
            # (upsample_only behavior); noise counter does not advance
            out["nlow"][lane, k, :] = 1.0
            return
        out["nlow"][lane, k, :min(ft.kx, 32)] = 1.0
        # chirp smoothing (host-carried)
        new_bw = self._BW_TAB[np.asarray(d.invf_mode, np.int64)]
        prev = self._bw[lane, :len(new_bw)]
        bw = np.where(new_bw < prev, 0.75 * new_bw + 0.25 * prev,
                      0.90625 * new_bw + 0.09375 * prev)
        bw = np.where(bw < 0.015625, 0.0, bw)
        self._bw[lane] = 0.0
        self._bw[lane, :len(bw)] = bw
        bw5 = self._bw[lane]
        out["bwj"][lane, k] = bw5[self._nb_of_tgt]
        prev_h = self._prev_harm[lane]
        if prev_h is None or len(prev_h) != ft.n_high:
            prev_h = np.zeros(ft.n_high, bool)
        harm = (np.asarray(d.add_harmonic, bool)
                if d.add_harmonic is not None
                else np.zeros(ft.n_high, bool))
        ni = int(self._noise_index[lane])
        for e in range(d.n_env):
            lo = max(d.t_e[e] * S.RATE, 0)
            hi = min(d.t_e[e + 1] * S.RATE, NSLOT)
            if hi <= lo:
                continue
            out["env_seg"][lane, k, lo:hi, e] = 1
            # envelope/noise/sinusoid quantities ship in BAND space and
            # expand to per-bin vectors ON DEVICE via the static
            # band→bin matmuls (round-5 serve-audio transfer cut — the
            # per-bin m-vectors were 4× the bytes)
            ev = np.asarray(d.env_lin[e], np.float32)
            out["e_bands"][lane, k, e, :len(ev)] = ev
            qe = 0 if d.n_noise_env == 1 or d.t_e[e] < d.t_q[1] else 1
            qv = np.asarray(d.noise_lin[qe], np.float32)
            out["q_bands"][lane, k, e, :len(qv)] = qv
            transient = (e == d.la) or (e == 0 and self._la_end[lane])
            out["delta_e"][lane, k, e] = 0 if transient else 1
            out["freq_res"][lane, k, e] = 1 if d.freq_res[e] else 0
            if harm.any():
                act = harm & ((e >= d.la) | prev_h)
                out["harm_act"][lane, k, e, :len(act)] = act
            # noise index advance for covered slots
            ns = hi - lo
            out["noise_start"][lane, k, lo:hi] = \
                (ni + m * np.arange(ns)) & 0x7FFFFFFF
            ni = (ni + m * ns) & 0x7FFFFFFF
        self._noise_index[lane] = ni
        self._prev_harm[lane] = harm
        self._la_end[lane] = d.la == d.n_env

    # ------------------------------------------------------------------
    def decode(self, packets: list[list[bytes]]) -> np.ndarray:
        """packets: n_programs lists of K packets each ->
        int16 [n_programs, K*2048, 2]."""
        return self.dispatch(self.prepare(packets))

    def dispatch(self, prepared) -> np.ndarray:
        """Run one :meth:`prepare`d batch on device and fetch its PCM.
        The pipeline's device half: touches only the carried state (and
        the fn captured at prepare time), so it can overlap the NEXT
        batch's :meth:`prepare` on another thread (round-5 serve-audio
        pipeline split — the host parse/fill was serializing against
        the dispatch at fleet scale)."""
        import jax.numpy as jnp
        fn, inp, smooth, hdr_key = prepared
        self._reconcile_state(smooth, hdr_key)
        self._state, pcm = fn(self._state,
                              {k: jnp.asarray(v) for k, v in inp.items()})
        pcm = np.asarray(pcm)                  # [N, K*2048] int16
        return pcm.reshape(self.n, 2, -1).transpose(0, 2, 1)

    def prepare(self, packets: list[list[bytes]]):
        """Host half of one batch decode: parse every packet, advance
        the per-lane bookkeeping, and build the device-input arrays.
        Returns an opaque item for :meth:`dispatch` (which must run in
        submission order — the carried state is sequential)."""
        K = len(packets[0])
        assert all(len(p) == K for p in packets)
        N = self.lanes
        parsed = []
        hdr_snap = []  # [p][k]: the packet's SBR header at parse time
        for p in range(self.n):
            dec = self._parsers[p]
            row = []
            snaps = []
            for k in range(K):
                try:
                    specs, ics1, sd = dec.parse(packets[p][k])
                except Exception:
                    specs, ics1, sd = None, None, None
                row.append((specs, ics1, sd))
                snap = None
                if sd is not None:
                    # the parse consumed prev_env/prev_noise for any
                    # delta-time coding; advance them the way the host
                    # SBRDecoder.process would (the batch path never
                    # calls process)
                    for ch, d in enumerate(sd):
                        if ch < len(dec._sbr) and d is not None:
                            dec._sbr[ch].prev_env = d.env[-1]
                            dec._sbr[ch].prev_noise = d.noise[-1]
                    if dec._sbr[0].tables is not None:
                        snap = dec._sbr[0].header
                snaps.append(snap)
            parsed.append(row)
            hdr_snap.append(snaps)
        # one device fn serves one SBR header per batch; pick it sticky
        # (avoid rebuild flapping in mixed fleets) else first-seen.  A
        # packet whose own header differs falls back to zeroed HF below.
        cands = [s for snaps in hdr_snap for s in snaps if s is not None]
        if getattr(self, "_hdr", None) is not None \
                and (not cands or any(s == self._hdr for s in cands)):
            # keep the sticky header — also through an all-corrupt
            # batch (a deep-fade dispatch must not flap the compiled fn
            # to the default header and wipe smoothing trajectories)
            hdr, ft = self._hdr, self._ft
        elif cands:
            hdr = cands[0]
            ft = S.derive_tables(hdr)
        else:  # no SBR seen yet, ever: derive nothing, HF silent
            hdr = S.SbrHeader()
            ft = S.derive_tables(hdr)
        # grow-only spectrum caps: find the live extent of every spectrum
        # in this batch BEFORE building the device fn (its basis slices
        # bake the caps); bucketed so growth recompiles at most a few
        # times ever
        need_l, need_s = 1, 1
        for p in range(self.n):
            for k in range(K):
                specs, ics1, _ = parsed[p][k]
                if specs is None:
                    continue
                for spec in specs:
                    if ics1.window_sequence == A.EIGHT_SHORT:
                        nz = np.flatnonzero(
                            spec.reshape(8, 128).any(axis=0))
                        if nz.size:
                            need_s = max(need_s, int(nz[-1]) + 1)
                    else:
                        nz = np.flatnonzero(spec)
                        if nz.size:
                            need_l = max(need_l, int(nz[-1]) + 1)
        if need_l > self._cap_long:
            self._cap_long = min(-(-need_l // 128) * 128, 1024)
        if need_s > self._cap_short:
            self._cap_short = min(-(-need_s // 16) * 16, 128)
        self._ensure(ft, hdr, K)
        m = ft.m

        inp = {
            "spec_long": np.zeros((N, K, self._cap_long), np.float32),
            "spec_short": np.zeros((N, K, 8, self._cap_short),
                                   np.float32),
            "win_long_idx": np.zeros((N, K), np.uint8),
            "win_short_idx": np.zeros((N, K), np.uint8),
            "short": np.zeros((N, K), bool),
            "bwj": np.zeros((N, K, m), np.float32),
            "env_seg": np.zeros((N, K, NSLOT, MAXENV), np.uint8),
            "e_bands": np.zeros((N, K, MAXENV, ft.n_high), np.float32),
            "q_bands": np.zeros((N, K, MAXENV, ft.n_q), np.float32),
            "harm_act": np.zeros((N, K, MAXENV, ft.n_high), np.uint8),
            "delta_e": np.ones((N, K, MAXENV), np.uint8),
            "noise_start": np.zeros((N, K, NSLOT), np.int32),
            "nlow": np.zeros((N, K, 32), np.float32),
            "freq_res": np.zeros((N, K, MAXENV), np.uint8),
        }
        for p in range(self.n):
            for k in range(K):
                specs, ics1, sd = parsed[p][k]
                for ch in range(2):
                    lane = 2 * p + ch
                    if specs is None:
                        # corrupt packet: silence (window stays zero)
                        self._prev_shape[lane] = 0
                        inp["nlow"][lane, k, :] = 1.0
                        continue
                    spec = specs[min(ch, len(specs) - 1)]
                    seq = ics1.window_sequence
                    shape = ics1.window_shape
                    prev = int(self._prev_shape[lane])
                    if seq == A.EIGHT_SHORT:
                        inp["spec_short"][lane, k] = \
                            spec.reshape(8, 128)[:, :self._cap_short]
                        inp["short"][lane, k] = True
                        inp["win_short_idx"][lane, k] = \
                            _short_window_index(shape, prev)
                    else:
                        inp["spec_long"][lane, k] = \
                            spec[:self._cap_long]
                        inp["win_long_idx"][lane, k] = \
                            _long_window_index(seq, shape, prev)
                    self._prev_shape[lane] = shape
                    dch = None
                    # a packet whose own header differs from the batch
                    # header cannot use the batch band maps: zeroed-HF
                    # fallback (upsample-only), low band passes through
                    if sd is not None and hdr_snap[p][k] == self._hdr:
                        dch = sd[min(ch, len(sd) - 1)]
                    self._prep_sbr(lane, dch, ft, inp, k)

        return (self._fn, inp, not hdr.smoothing_mode, self._key[3:])

    # ------------------------------------------------------------------
    # checkpoint / resume (serving analog:
    # serve.MultiStationReceiver.checkpoint — SURVEY §5 A4)
    # ------------------------------------------------------------------
    _STATE_KEYS = ("overlap", "qa_hist", "syn_hist", "tail_r", "tail_i",
                   "g_hist", "q_hist")
    _HDR_FIELDS = ("amp_res", "start_freq", "stop_freq", "xover_band",
                   "freq_scale", "alter_scale", "noise_bands",
                   "limiter_bands", "limiter_gains", "interpol_freq",
                   "smoothing_mode")

    def checkpoint(self) -> dict:
        """Snapshot the streaming decode state as named numpy arrays —
        the device pytree (overlap, QMF histories, LPC tails), the host
        SBR bookkeeping (chirp, noise index, window shapes, persisted
        harmonics), and each program parser's cross-packet state (SBR
        header + delta-time carries + the PNS generator).  Restorable
        cross-process via ``np.savez(path, **checkpoint())`` into a
        fresh, identically-parameterized decoder."""
        import json
        out = {}
        if self._state is not None:
            for name in self._STATE_KEYS:
                if name in self._state:  # g/q_hist: smoothing headers
                    out[f"dev_{name}"] = np.asarray(self._state[name])
        out["bw"] = self._bw.copy()
        out["noise_index"] = self._noise_index.copy()
        out["prev_shape"] = self._prev_shape.copy()
        out["la_end"] = self._la_end.copy()
        for ln, h in enumerate(self._prev_harm):
            out[f"prev_harm_{ln}"] = (np.zeros(0, bool) if h is None
                                      else np.asarray(h, bool))
        for p, dec in enumerate(self._parsers):
            rng_state = dec._rng.bit_generator.state
            out[f"rng_{p}"] = np.frombuffer(
                json.dumps(rng_state).encode(), np.uint8)
            for c, sb in enumerate(dec._sbr):
                hdr = sb.header
                out[f"hdr_{p}_{c}"] = np.asarray(
                    [] if hdr is None else
                    [getattr(hdr, f) for f in self._HDR_FIELDS],
                    np.int64)
                for nm, v in (("penv", sb.prev_env),
                              ("pnoise", sb.prev_noise)):
                    out[f"{nm}_{p}_{c}"] = \
                        (np.zeros(0) if v is None
                         else np.asarray(v, np.float64))
        return out

    def restore(self, state):
        """Install a :meth:`checkpoint` snapshot (dict or NpzFile)."""
        import json
        if f"dev_{self._STATE_KEYS[0]}" in state:
            self._state = {k: jnp.asarray(np.asarray(state[f"dev_{k}"]))
                           for k in self._STATE_KEYS
                           if f"dev_{k}" in state}
            # _reconcile_state keeps the restored trajectories
            self._restored = True
        self._bw = np.asarray(state["bw"]).copy()
        self._noise_index = np.asarray(state["noise_index"]).copy()
        self._prev_shape = np.asarray(state["prev_shape"]).copy()
        if "la_end" in state:
            self._la_end = np.asarray(state["la_end"]).astype(bool)
        for ln in range(self.lanes):
            h = np.asarray(state[f"prev_harm_{ln}"])
            self._prev_harm[ln] = None if h.size == 0 \
                else h.astype(bool)
        for p, dec in enumerate(self._parsers):
            dec._rng.bit_generator.state = json.loads(
                np.asarray(state[f"rng_{p}"]).tobytes().decode())
            for c, sb in enumerate(dec._sbr):
                hv = np.asarray(state[f"hdr_{p}_{c}"])
                if hv.size:
                    sb.header = S.SbrHeader(
                        **{f: int(x) for f, x in
                           zip(self._HDR_FIELDS, hv)})
                    sb.tables = S.derive_tables(sb.header)
                pe = np.asarray(state[f"penv_{p}_{c}"])
                sb.prev_env = pe if pe.size else None
                pn = np.asarray(state[f"pnoise_{p}_{c}"])
                sb.prev_noise = pn if pn.size else None
