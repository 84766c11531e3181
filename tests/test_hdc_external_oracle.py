"""External PCM oracle for the clean-room HDC codec (libavcodec).

Every other audio test validates the decoder against THIS REPO'S encoder
(roundtrips), which cannot catch a shared encoder<->decoder
misunderstanding.  Here the encoder serializes the SAME frame plan both
as an HDC packet and as a standard AAC-LC / HE-AAC ADTS frame
(tx/hdc_encoder.encode_frame_dual), the ADTS stream is decoded by the
system libavcodec (an independent, conformance-tested implementation),
and the two PCM outputs must agree.

This suite caught three real decoder bugs in round 3:
  * TNS reflection coefficients negated (libavcodec's extracted tables
    store -k; faad/ISO recursion wants +k) -> pi-shifted TNS filter;
  * filterbank gain 2x the ISO scale (decode(encode()) hid it);
  * SBR stopMin rounded at half scale (30 vs spec 29 at 44100) ->
    master frequency table desynchronized from conformant decoders.

Reference contract: the reference plays HDC through patched FAAD2
(/root/reference/src/output.c:126-163, support/faad2-hdc-support.patch);
bit-exact packets were already cross-checked, this closes the PCM gap.
"""

from __future__ import annotations

import numpy as np
import pytest
from numpy.fft import irfft, rfft

from nrsc5_tpu.audio import oracle
from nrsc5_tpu.audio.hdc_decoder import HDCDecoder
from nrsc5_tpu.tx.hdc_encoder import HDCEncoder

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="libavcodec oracle unavailable")

FS = 44100
# constant lead of our SBR output vs libavcodec's (6 QMF subsamples
# minus the half-sample phase-convention difference of the QMF pairs)
SBR_LAG = 383.5


def _signal(n_frames: int, seed: int = 7, hiband: bool = False):
    rng = np.random.default_rng(seed)
    n = n_frames * 2048
    t = np.arange(n) / FS
    noise = rng.standard_normal(n)
    S = rfft(noise)
    lo = irfft(np.where(np.arange(len(S)) < 3000, S, 0), n)
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.25 * lo
    if hiband:
        S2 = rfft(rng.standard_normal(n))
        f = np.arange(len(S2)) * FS / n
        sig = sig + 0.12 * irfft(np.where((f > 5000) & (f < 14000), S2, 0), n)
    return sig


def _run_lc(pcm: np.ndarray, channels: int, **enc_kw):
    """Encode dual; decode HDC with our core decoder and ADTS with
    libavcodec; return (ours[n, ch] at +-1 scale, ffmpeg[n, ch], enc)."""
    enc = HDCEncoder(channels=channels, sbr=False, **enc_kw)
    dec = HDCDecoder()
    adts = b""
    ours = []
    n = len(pcm) // 2048
    for k in range(n):
        frame = pcm[k * 2048:(k + 1) * 2048]
        h, a = enc.encode_frame_dual(frame)
        adts += a
        core = dec.decode_float(h, core=True)
        assert core is not None, f"our decoder rejected frame {k}"
        ours.append(core)
    ref, rate = oracle.decode_adts(adts)
    assert rate == 22050
    ours = np.concatenate(ours) / 32768.0
    m = min(len(ours), len(ref))
    return ours[:m], ref[:m, :ours.shape[1]], enc


def _snr_db(a: np.ndarray, b: np.ndarray) -> float:
    err = a - b
    return 10 * np.log10((a ** 2).sum() / max((err ** 2).sum(), 1e-30))


# ----------------------------------------------------------------------
# AAC-LC core: every tool combination, sample-aligned waveform match
# ----------------------------------------------------------------------
def test_lc_mono_plain():
    pcm = _signal(10).reshape(-1, 1) * 0.8
    a, b, _ = _run_lc(pcm, 1, pns=False, ms=False, intensity=False)
    assert _snr_db(a, b) > 60.0


def test_lc_stereo_plain():
    s = _signal(10)
    pcm = np.stack([s, _signal(10, seed=9)], -1) * 0.6
    a, b, _ = _run_lc(pcm, 2, pns=False, ms=False, intensity=False)
    assert _snr_db(a, b) > 60.0


def test_lc_mid_side():
    s = _signal(10)
    rng = np.random.default_rng(1)
    pcm = np.stack([s, s * 0.97 + 0.01 * rng.standard_normal(len(s))],
                   -1) * 0.6
    a, b, enc = _run_lc(pcm, 2, pns=False, ms=True, intensity=False)
    assert enc.ms_frames >= 5, "M/S did not engage"
    assert _snr_db(a, b) > 60.0


def test_lc_intensity():
    rng = np.random.default_rng(3)
    n = 10 * 2048
    S = rfft(rng.standard_normal(n))
    f = np.arange(len(S)) * FS / n
    hi = irfft(np.where((f > 5200) & (f < 9500), S, 0), n)
    lo = _signal(10, seed=4)
    pcm = np.stack([0.4 * lo + 0.5 * hi, 0.35 * lo + 0.35 * hi], -1)
    a, b, enc = _run_lc(pcm, 2, pns=False, ms=False, intensity=True)
    assert enc.is_bands > 20, "intensity stereo did not engage"
    assert _snr_db(a, b) > 60.0


def test_lc_tns():
    # lowpassed noise has a compact temporal envelope per bin -> the
    # order-4 spectral LPC clears its prediction-gain gate
    rng = np.random.default_rng(3)
    n = 10 * 2048
    sig = rng.standard_normal(n) * 0.2
    S = rfft(sig)
    sig = irfft(np.where(np.arange(len(S)) < 3000, S, 0), n)
    a, b, enc = _run_lc(sig.reshape(-1, 1), 1,
                        pns=False, ms=False, intensity=False)
    assert enc.tns_channels >= 1, "TNS did not engage"
    assert _snr_db(a, b) > 60.0


def test_lc_short_windows():
    rng = np.random.default_rng(5)
    x = 0.05 * rng.standard_normal((12 * 2048, 2))
    for hit in range(3, 12, 3):
        x[hit * 2048 + 500:hit * 2048 + 900] += \
            rng.standard_normal((400, 2)) * 0.7
    a, b, enc = _run_lc(x, 2, pns=False, ms=False, intensity=False)
    assert enc.seq_counts[2] >= 2, "EIGHT_SHORT did not engage"
    assert _snr_db(a, b) > 60.0


def test_lc_pns_band_energy():
    """PNS uses decoder-local noise (ISO leaves the generator free), so
    waveforms legitimately differ inside PNS bands; compare smoothed
    power spectra instead."""
    rng = np.random.default_rng(6)
    n = 12 * 2048
    t = np.arange(n) / FS
    # tonal + a broad low noise floor the encoder will PNS-substitute
    sig = (0.4 * np.sin(2 * np.pi * 500 * t)
           + 0.002 * rng.standard_normal(n)).reshape(-1, 1)
    enc = HDCEncoder(channels=1, sbr=False, pns=True, ms=False,
                     intensity=False, floor_db=-40.0)
    dec = HDCDecoder()
    adts = b""
    ours = []
    for k in range(12):
        h, a = enc.encode_frame_dual(sig[k * 2048:(k + 1) * 2048])
        adts += a
        ours.append(dec.decode_float(h, core=True))
    assert enc.pns_bands > 10, "PNS did not engage"
    ref, rate = oracle.decode_adts(adts)
    a_ = np.concatenate(ours)[:, 0] / 32768.0
    b_ = ref[:len(a_), 0]

    def pwelch(y):
        seg, acc, w = 2048, None, np.hanning(2048)
        for s in range(0, len(y) - seg, seg // 2):
            Y = np.abs(rfft(y[s:s + seg] * w)) ** 2
            acc = Y if acc is None else acc + Y
        return acc

    pa, pb = pwelch(a_), pwelch(b_)
    # compare in octave-ish chunks over the coded band
    f = np.arange(len(pa)) * 22050 / 2048
    for lo, hi in ((100, 400), (400, 1600), (1600, 6400)):
        sel = (f >= lo) & (f < hi)
        ratio = 10 * np.log10(pa[sel].sum() / pb[sel].sum())
        assert abs(ratio) < 3.0, f"band {lo}-{hi} Hz off by {ratio:.1f} dB"


# ----------------------------------------------------------------------
# HE-AAC / SBR path
# ----------------------------------------------------------------------
def test_sbr_stereo():
    """Full SBR chain vs libavcodec: the ADTS twin decodes without a
    single parse error, the low band matches sample-for-sample, and the
    regenerated high band agrees in waveform and energy."""
    n_frames = 14
    s = _signal(n_frames, hiband=True)
    pcm = np.stack([s, s * 0.9], -1) * 0.8
    enc = HDCEncoder(channels=2, sbr=True, pns=False, ms=False,
                     intensity=False)
    dec = HDCDecoder()
    adts = b""
    ours = []
    for k in range(n_frames):
        h, a = enc.encode_frame_dual(pcm[k * 2048:(k + 1) * 2048])
        adts += a
        full = dec.decode_float(h)
        assert full is not None
        ours.append(full)
    ref, rate = oracle.decode_adts(adts)
    assert rate == 44100, "implicit SBR not engaged by libavcodec"
    a_ = np.concatenate(ours)[:, 0] / 32768.0
    b_ = ref[:, 0]

    # our SBR pipeline leads libavcodec's by a CONSTANT 383.5 samples
    # (6 QMF subsamples minus half a sample — the two conformant QMF
    # pairs differ by a half-sample phase convention); align exactly
    m = min(len(a_), len(b_))
    a_, b_ = a_[:m], b_[:m]
    X = rfft(b_)
    k = np.arange(len(X))
    b_ = irfft(X * np.exp(2j * np.pi * k * SBR_LAG / m), m)

    def band(x, lo, hi):
        Xb = rfft(x)
        f = np.arange(len(Xb)) * FS / len(x)
        return irfft(np.where((f >= lo) & (f < hi), Xb, 0), len(x))

    skip = 4 * 2048  # let both decoders settle

    def banded(lo, hi):
        # the HF generator's patched bins carry their own phase
        # relationship, so refine the residual alignment per band
        # (sub-sample, within +-1 of the global constant)
        x = band(a_, lo, hi)[skip:-skip]
        best = None
        for extra in (-0.5, 0.0, 0.5):
            Xe = rfft(b_)
            ke = np.arange(len(Xe))
            be = irfft(Xe * np.exp(2j * np.pi * ke * extra / m), m)
            y = band(be, lo, hi)[skip:-skip]
            c = float(np.dot(x, y)
                      / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12))
            s = _snr_db(x, y)
            if best is None or s > best[0]:
                best = (s, c, np.sqrt((x ** 2).mean()),
                        np.sqrt((y ** 2).mean()))
        return best

    snr_lo, corr_lo, _, _ = banded(0, 5800)
    assert corr_lo > 0.999 and snr_lo > 35.0, (snr_lo, corr_lo)

    snr_hi, corr_hi, rms_a, rms_b = banded(7200, 14000)
    # high band: the regenerated content depends on each decoder's
    # patch map (libavcodec's master-table rounding differs from ours
    # in the top region), so waveform correlation varies with content;
    # the transmitted ENVELOPE must still land the same energy
    assert corr_hi > 0.35, corr_hi
    assert abs(20 * np.log10(rms_a / rms_b)) < 3.0, (rms_a, rms_b)

    snr_full, corr_full, _, _ = banded(0, 16000)
    assert snr_full > 13.0 and corr_full > 0.97, (snr_full, corr_full)


def test_sbr_mono_low_band():
    """Mono HE-AAC: libavcodec upmixes implicit-PS streams, so only the
    low band is comparable; it must still match exactly."""
    n_frames = 10
    pcm = _signal(n_frames, hiband=True).reshape(-1, 1) * 0.8
    enc = HDCEncoder(channels=1, sbr=True, pns=False, ms=False,
                     intensity=False)
    dec = HDCDecoder()
    adts = b""
    ours = []
    for k in range(n_frames):
        h, a = enc.encode_frame_dual(pcm[k * 2048:(k + 1) * 2048])
        adts += a
        ours.append(dec.decode_float(h))
    ref, rate = oracle.decode_adts(adts)
    assert rate == 44100
    a_ = np.concatenate(ours)[:, 0] / 32768.0
    b_ = ref[:, 0]

    m = min(len(a_), len(b_))
    a_, b_ = a_[:m], b_[:m]
    X = rfft(b_)
    k = np.arange(len(X))
    b_ = irfft(X * np.exp(2j * np.pi * k * SBR_LAG / m), m)

    def band(x):
        Xb = rfft(x)
        f = np.arange(len(Xb)) * FS / len(x)
        return irfft(np.where(f < 5800, Xb, 0), len(x))

    x, y = band(a_)[8192:-8192], band(b_)[8192:-8192]
    assert _snr_db(x, y) > 30.0


# ----------------------------------------------------------------------
# robustness: the decoder must never raise on corrupt packets
# ----------------------------------------------------------------------
def test_bitflip_fuzz_no_crash():
    pcm = _signal(6, hiband=True)
    enc = HDCEncoder(channels=2, sbr=True)
    packets = [enc.encode_frame(np.stack([pcm[k * 2048:(k + 1) * 2048]] * 2,
                                         -1) * 0.5)
               for k in range(6)]
    rng = np.random.default_rng(0xF00D)
    dec = HDCDecoder()
    for trial in range(300):
        p = bytearray(packets[trial % len(packets)])
        for _ in range(rng.integers(1, 6)):
            p[rng.integers(0, len(p))] ^= 1 << rng.integers(0, 8)
        out = dec.decode(bytes(p))  # must return ndarray or None
        assert out is None or isinstance(out, np.ndarray)


def test_sbr_interpol_freq_off():
    """bs_interpol_freq=0 (per-band averaged gains) against libavcodec:
    the header-extra-2 fields must survive both serializations and the
    averaged-gain envelope must land the same band energies."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    hdr = SbrHeader(start_freq=8, stop_freq=7, amp_res=0, xover_band=2,
                    interpol_freq=0)
    n_frames = 14
    s = _signal(n_frames, hiband=True)
    pcm = np.stack([s, s * 0.9], -1) * 0.8
    enc = HDCEncoder(channels=2, sbr=True, pns=False, ms=False,
                     intensity=False, sbr_header=hdr)
    dec = HDCDecoder()
    adts = b""
    ours = []
    for k in range(n_frames):
        h, a = enc.encode_frame_dual(pcm[k * 2048:(k + 1) * 2048])
        adts += a
        full = dec.decode_float(h)
        assert full is not None
        ours.append(full)
    ref, rate = oracle.decode_adts(adts)
    assert rate == 44100, "implicit SBR not engaged by libavcodec"
    a_ = np.concatenate(ours)[:, 0] / 32768.0
    b_ = ref[:, 0]
    m = min(len(a_), len(b_))
    a_, b_ = a_[:m], b_[:m]
    X = rfft(b_)
    k = np.arange(len(X))
    b_ = irfft(X * np.exp(2j * np.pi * k * SBR_LAG / m), m)

    def band(x, lo, hi):
        Xb = rfft(x)
        f = np.arange(len(Xb)) * FS / len(x)
        return irfft(np.where((f >= lo) & (f < hi), Xb, 0), len(x))

    skip = 4 * 2048
    x = band(a_, 0, 5800)[skip:-skip]
    y = band(b_, 0, 5800)[skip:-skip]
    assert _snr_db(x, y) > 35.0
    xh = band(a_, 7200, 14000)[skip:-skip]
    yh = band(b_, 7200, 14000)[skip:-skip]
    rms_a = np.sqrt((xh ** 2).mean())
    rms_b = np.sqrt((yh ** 2).mean())
    assert abs(20 * np.log10(rms_a / rms_b)) < 3.0, (rms_a, rms_b)


def test_sbr_smoothing_mode_on():
    """bs_smoothing_mode=0 headers against libavcodec: the header bit
    must survive both serializations, ffmpeg must engage SBR, and band
    energies must agree.  NB: the smoothing filter itself sits ~36 dB
    below the signal while the HF patch-map differences cap oracle
    agreement near 1 dB, so this cannot discriminate filter semantics —
    test_audio_batch.test_batch_smoothing_mode pins the host==device
    filter parity at a level that does."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    hdr = SbrHeader(start_freq=8, stop_freq=7, amp_res=0, xover_band=2,
                    smoothing_mode=0)
    n_frames = 14
    s = _signal(n_frames, hiband=True)
    pcm = np.stack([s, s * 0.9], -1) * 0.8
    enc = HDCEncoder(channels=2, sbr=True, pns=False, ms=False,
                     intensity=False, sbr_header=hdr)
    dec = HDCDecoder()
    adts = b""
    ours = []
    for k in range(n_frames):
        h, a = enc.encode_frame_dual(pcm[k * 2048:(k + 1) * 2048])
        adts += a
        full = dec.decode_float(h)
        assert full is not None
        ours.append(full)
    ref, rate = oracle.decode_adts(adts)
    assert rate == 44100, "implicit SBR not engaged by libavcodec"
    a_ = np.concatenate(ours)[:, 0] / 32768.0
    b_ = ref[:, 0]
    m = min(len(a_), len(b_))
    a_, b_ = a_[:m], b_[:m]
    X = rfft(b_)
    k = np.arange(len(X))
    b_ = irfft(X * np.exp(2j * np.pi * k * SBR_LAG / m), m)

    def band(x, lo, hi):
        Xb = rfft(x)
        f = np.arange(len(Xb)) * FS / len(x)
        return irfft(np.where((f >= lo) & (f < hi), Xb, 0), len(x))

    skip = 4 * 2048
    x = band(a_, 0, 5800)[skip:-skip]
    y = band(b_, 0, 5800)[skip:-skip]
    assert _snr_db(x, y) > 35.0  # low band untouched by smoothing
    xh = band(a_, 7200, 14000)[skip:-skip]
    yh = band(b_, 7200, 14000)[skip:-skip]
    rms_a = np.sqrt((xh ** 2).mean())
    rms_b = np.sqrt((yh ** 2).mean())
    assert abs(20 * np.log10(rms_a / rms_b)) < 3.0, (rms_a, rms_b)
    # waveform correlation of the regenerated band: the smoothing filter
    # shapes the gain trajectory — a wrong filter (or none) decorrelates
    c = float(np.dot(xh, yh)
              / (np.linalg.norm(xh) * np.linalg.norm(yh) + 1e-12))
    assert c > 0.35, c


@pytest.mark.parametrize("late", [False, True])
def test_sbr_transient_grids(late):
    """Transient frames emit 2-envelope variable grids (VARFIX early /
    FIXVAR late attack, l_A on the attack envelope).  libavcodec parses
    the identical ADTS twin: any error in the variable-grid bit syntax
    (border/pointer/freq_res field order) desynchronizes its SBR parse
    and collapses the comparison — this pins our grid writer AND,
    transitively, our grid parser against a conformant implementation."""
    n_frames = 14
    rng = np.random.default_rng(88)
    n = n_frames * 2048
    t = np.arange(n) / FS
    x = 0.04 * np.sin(2 * np.pi * 440 * t) \
        + 0.01 * rng.standard_normal(n)
    S2 = rfft(rng.standard_normal(n))
    f = np.arange(len(S2)) * FS / n
    x += 0.05 * irfft(np.where((f > 6000) & (f < 13000), S2, 0), n)
    pos0 = 1500 if late else 700
    for k in range(2, n_frames - 2, 3):
        pos = k * 2048 + pos0
        tt = np.arange(256)
        burst = (np.sin(2 * np.pi * 2400 * tt / FS)
                 + 0.5 * np.sin(2 * np.pi * 3500 * tt / FS + 1.0)) \
            * np.hanning(256)
        x[pos:pos + 256] += 0.7 * burst / np.abs(burst).max()
    np.clip(x, -1, 1, out=x)
    pcm = np.stack([x, x * 0.9], -1)

    enc = HDCEncoder(channels=2, sbr=True, pns=False, ms=False,
                     intensity=False)
    dec = HDCDecoder()
    adts = b""
    ours = []
    for k in range(n_frames):
        h, a = enc.encode_frame_dual(pcm[k * 2048:(k + 1) * 2048])
        adts += a
        full = dec.decode_float(h)
        assert full is not None
        ours.append(full)
    from nrsc5_tpu.audio import aac_core as A
    assert enc.seq_counts[A.EIGHT_SHORT] >= 3, enc.seq_counts
    ref, rate = oracle.decode_adts(adts)
    assert rate == 44100, "implicit SBR not engaged by libavcodec"
    a_ = np.concatenate(ours)[:, 0] / 32768.0
    b_ = ref[:, 0]
    m = min(len(a_), len(b_))
    a_, b_ = a_[:m], b_[:m]
    X = rfft(b_)
    k = np.arange(len(X))
    b_ = irfft(X * np.exp(2j * np.pi * k * SBR_LAG / m), m)

    def band(sig, lo, hi):
        Xb = rfft(sig)
        fr = np.arange(len(Xb)) * FS / len(sig)
        return irfft(np.where((fr >= lo) & (fr < hi), Xb, 0), len(sig))

    skip = 4 * 2048
    xl = band(a_, 0, 5800)[skip:-skip]
    yl = band(b_, 0, 5800)[skip:-skip]
    assert _snr_db(xl, yl) > 30.0  # core survives short windows
    xh = band(a_, 7200, 14000)[skip:-skip]
    yh = band(b_, 7200, 14000)[skip:-skip]
    rms_a = np.sqrt((xh ** 2).mean())
    rms_b = np.sqrt((yh ** 2).mean())
    assert abs(20 * np.log10(rms_a / rms_b)) < 3.0, (rms_a, rms_b)


# ----------------------------------------------------------------------
# differential fuzz vs the oracle (VERDICT r4 item 8)
# ----------------------------------------------------------------------
def _fuzz_signals(rng, n):
    """Pathological-but-legal encoder inputs: the corners where decoder
    implementations diverge (all-zero sections, max-gain scalefactors,
    dense short windows, decorrelated channels, clipped flats)."""
    t = np.arange(n)
    picks = [
        np.zeros(n),                                   # digital silence
        np.full(n, 0.93),                              # DC rail
        np.sign(np.sin(2 * np.pi * 311.0 * t / FS)) * 0.9,  # clipped square
        rng.standard_normal(n) * 0.9,                  # full-scale hiss
        np.where(t % 1777 == 0, 0.95, 0.0),            # impulse train
        np.sin(2 * np.pi * 10986.3 * t / FS) * 0.7,    # tone at band edge
        irfft(np.where(np.arange(n // 2 + 1) < 40,
                       rfft(rng.standard_normal(n)), 0), n) * 3.0,  # rumble
        rng.standard_normal(n) * (10.0 ** (-3 + 3 * np.sin(
            2 * np.pi * t / (2 * 2048)))),             # 60 dB level sweeps
    ]
    return picks


def test_differential_fuzz_vs_oracle():
    """Seeded differential fuzz of the clean-room decoder against
    libavcodec (VERDICT r4 item 8).  The HDC packet and its ADTS twin
    have DIFFERENT bit layouts (compact ICS header vs standard
    ics_info, patch hdc_data_frame vs ISO raw_data_block), so a bit
    mutation cannot be mirrored across the two serializations; the
    differential axis therefore fuzzes the PLAN space — pathological
    legal inputs driving every coding tool through unusual operating
    points (all-zero spectra, rail DC, clipped flats, impulse trains,
    60 dB level sweeps, decorrelated channels) across tool configs —
    and requires our PCM to agree with libavcodec's on the SAME
    streams within the suite's established bound.  Divergences found
    here become pinned regressions (none at introduction)."""
    rng = np.random.default_rng(0xD1FF)
    n_frames = 6
    n = n_frames * 2048
    configs = [
        dict(channels=1, pns=False, ms=False, intensity=False),
        dict(channels=2, pns=False, ms=True, intensity=False),
        dict(channels=2, pns=True, ms=False, intensity=True),
        dict(channels=2, pns=True, ms=True, intensity=True),
    ]
    for si, sig in enumerate(_fuzz_signals(rng, n)):
        cfg = configs[si % len(configs)]
        nch = cfg.pop("channels")
        if nch == 2:
            other = _fuzz_signals(rng, n)[(si + 3) % 8]
            pcm = np.stack([sig, 0.7 * sig + 0.3 * other], -1)
        else:
            pcm = sig.reshape(-1, 1)
        a, b, _ = _run_lc(pcm, nch, **cfg)
        cfg["channels"] = nch
        err = float(((a - b) ** 2).sum())
        sig_pow = float((a ** 2).sum())
        # agreement bound: 55 dB like the rest of the suite, or an
        # absolute floor for (near-)silent content where SNR is moot
        assert err <= sig_pow * 10 ** (-5.5) + 1e-5 * len(a), (
            si, cfg, _snr_db(a, b))


def test_differential_fuzz_mutations():
    """Mutation axis of the differential fuzz: seeded bit flips, byte
    noise, truncations and duplications over valid HDC packets from
    every tool config.  The decoder must never raise; every ACCEPTED
    mutant must produce finite PCM (a corrupt scalefactor may
    legitimately be loud, but NaN/Inf would poison the elastic buffer
    and the batched device decoder's carried state)."""
    from nrsc5_tpu.audio.hdc_decoder import HDCDecoder

    rng = np.random.default_rng(0xFA22)
    n_frames = 4
    n = n_frames * 2048
    packets = []
    for si, sig in enumerate(_fuzz_signals(rng, n)[:4]):
        enc = HDCEncoder(channels=2, sbr=si % 2 == 0)
        for k in range(n_frames):
            frame = np.stack([sig, sig * 0.8], -1)[k * 2048:(k + 1) * 2048]
            packets.append(enc.encode_frame(frame * 0.6))
    dec = HDCDecoder()
    accepted = 0
    for trial in range(400):
        p = bytearray(packets[trial % len(packets)])
        kind = trial % 4
        if kind == 0:  # bit flips
            for _ in range(int(rng.integers(1, 8))):
                p[rng.integers(0, len(p))] ^= 1 << rng.integers(0, 8)
        elif kind == 1:  # truncate
            p = p[:rng.integers(1, len(p))]
        elif kind == 2:  # byte noise burst
            at = int(rng.integers(0, len(p)))
            ln = int(rng.integers(1, 24))
            p[at:at + ln] = rng.integers(0, 256, ln).astype(np.uint8) \
                .tobytes()
        else:  # duplicate a slice (length changes, desyncs sections)
            at = int(rng.integers(0, len(p)))
            ln = int(rng.integers(1, 32))
            p = p[:at] + p[at:at + ln] + p[at:]
        out = dec.decode_float(bytes(p))
        if out is not None:
            accepted += 1
            assert np.isfinite(out).all(), f"non-finite PCM, trial {trial}"
    # sanity: the harness really exercises the accept path too
    assert accepted >= 10, accepted
