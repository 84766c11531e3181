"""HDC (AAC-LC core) codec tests: encoder-truth roundtrips, filterbank
perfect reconstruction, huffman properties, and corrupt-packet rejection.

The reference decodes HDC via a patched FAAD2 (support/
faad2-hdc-support.patch); here both directions are implemented clean-room
(nrsc5_tpu/audio, nrsc5_tpu/tx/hdc_encoder) and verified against each
other — the same encoder-truth strategy as the L1/L2 chain."""

import numpy as np
import pytest

from nrsc5_tpu.audio import aac_core as A
from nrsc5_tpu.audio.hdc_decoder import HDCDecoder
from nrsc5_tpu.tx.hdc_encoder import HDCEncoder

SR = 44100


def _music_like(n, rng, lp_hz=4000.0):
    """Band-limited noise with a 1/f-ish spectrum (speech/music proxy)."""
    w = rng.normal(size=n)
    W = np.fft.rfft(w)
    f = np.fft.rfftfreq(n, 1 / SR)
    W *= 1.0 / np.sqrt(1 + (f / 300.0) ** 2)
    W[f > lp_hz] = 0.0
    x = np.fft.irfft(W, n)
    return 0.4 * x / np.abs(x).max()


def _align_snr(y, x, search=6000, skip=8000, n=14000):
    """Find the codec latency by correlation, return (lag, SNR dB)."""
    best = (0, -1.0)
    for lag in range(search):
        seg, r = y[skip:skip + n // 2], x[skip - lag:skip - lag + n // 2]
        c = np.dot(seg, r) / (np.linalg.norm(seg) * np.linalg.norm(r) + 1e-12)
        if c > best[1]:
            best = (lag, c)
    lag = best[0]
    seg, r = y[skip:skip + n], x[skip - lag:skip - lag + n]
    err = seg - r
    return lag, 10 * np.log10(np.dot(r, r) / max(np.dot(err, err), 1e-12))


def _run_codec(pcm, channels):
    enc = HDCEncoder(channels)
    dec = HDCDecoder()
    outs, sizes = [], []
    n_frames = pcm.shape[0] // 2048
    for f in range(n_frames):
        pkt = enc.encode_frame(pcm[f * 2048:(f + 1) * 2048])
        sizes.append(len(pkt))
        out = dec.decode(pkt)
        assert out is not None, f"frame {f} failed to decode"
        assert out.dtype == np.int16 and out.size == 4096
        outs.append(out)
    y = np.concatenate(outs).reshape(-1, 2).astype(np.float64) / 32768.0
    return y, sizes


def test_roundtrip_stereo(rng):
    x = _music_like(12 * 2048, rng)
    stereo = np.stack([x, 0.7 * x], axis=-1)
    y, sizes = _run_codec(stereo, 2)
    lag, snr = _align_snr(y[:, 0], x)
    assert snr > 30.0, f"left SNR {snr:.1f} dB (lag {lag})"
    _, snr_r = _align_snr(y[:, 1], 0.7 * x)
    assert snr_r > 30.0, f"right SNR {snr_r:.1f} dB"
    # sane bitrate for the harness subset
    kbps = np.mean(sizes) * 8 / (2048 / SR) / 1000
    assert kbps < 400, f"{kbps:.0f} kbps"


def test_roundtrip_mono(rng):
    x = _music_like(12 * 2048, rng)
    y, _ = _run_codec(x[:, None], 1)
    # mono duplicates into both output channels
    assert np.array_equal(y[:, 0], y[:, 1])
    _, snr = _align_snr(y[:, 0], x)
    assert snr > 30.0, f"mono SNR {snr:.1f} dB"


def test_corrupt_packets(rng):
    x = _music_like(4 * 2048, rng)
    enc = HDCEncoder(1)
    pkts = [enc.encode_frame(x[i * 2048:(i + 1) * 2048, None])
            for i in range(4)]
    dec = HDCDecoder()
    # random garbage must never raise, only return None or junk PCM
    for _ in range(50):
        garbage = rng.integers(0, 256, rng.integers(1, 400),
                               dtype=np.uint8).tobytes()
        dec.decode(garbage)
    # truncations of a valid packet
    for cut in (1, 7, len(pkts[0]) // 2):
        dec.decode(pkts[0][:cut])
    # a valid packet still decodes afterwards
    assert dec.decode(pkts[1]) is not None


def test_filterbank_perfect_reconstruction(rng):
    x = rng.normal(0, 1, 1024 * 6)
    frames = x.reshape(-1, 1024)
    for shape in (0, 1):
        seqs = [A.ONLY_LONG, A.LONG_START, A.EIGHT_SHORT, A.LONG_STOP,
                A.ONLY_LONG, A.ONLY_LONG]
        overlap, prev = np.zeros(1024), np.zeros(1024)
        out = []
        for i, seq in enumerate(seqs):
            X = A.filterbank_analysis(np.concatenate([prev, frames[i]]),
                                      seq, shape, shape)
            y, overlap = A.filterbank_synthesis(X, seq, shape, shape,
                                                overlap)
            out.append(y)
            prev = frames[i]
        out = np.concatenate(out)
        err = np.abs(out[1024:] - x[:len(out) - 1024]).max()
        assert err < 1e-5, f"shape {shape}: PR error {err}"


def test_fft_mdct_matches_basis(rng):
    """The O(N log N) FFT (I)MDCT equals the dense cosine-basis spec form
    (aac_core._mdct_basis) for both window lengths, incl. batches."""
    for n in (A.SHORT_LEN, A.FRAME_LEN):
        B = A._mdct_basis(n)
        x = rng.normal(0, 1, (8, 2 * n))
        X = rng.normal(0, 1, (8, n))
        assert np.abs(A.mdct(x) - x @ B).max() < 1e-9
        assert np.abs(A.imdct(X) - (2.0 / n) * (X @ B.T)).max() < 1e-11
        assert np.abs(A.mdct(x[0]) - x[0] @ B).max() < 1e-9


@pytest.mark.parametrize("cb", list(range(1, 12)))
def test_spectral_codebook_roundtrip(rng, cb):
    from nrsc5_tpu.audio.bitio import BitReader, BitWriter
    from nrsc5_tpu.audio.hdc_decoder import SPEC_HUFF, _read_escape
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder as E
    dim, lav, signed = A.CB_META[cb]
    huff = SPEC_HUFF[cb]
    lo, hi = (-lav, lav) if signed else (0, lav)
    vals = rng.integers(lo, hi + 1, 64 * dim)
    if cb == A.ESC_HCB:
        vals = rng.integers(-900, 901, 64 * dim)  # exercises escapes
    bw = BitWriter()
    for i in range(0, len(vals), dim):
        tup = [int(v) for v in vals[i:i + dim]]
        if cb == A.ESC_HCB:
            coded = [min(abs(v), 16) for v in tup]
        elif not signed:
            coded = [abs(v) for v in tup]
        else:
            coded = tup
        huff.encode(bw, A.pack_index(cb, coded))
        if not signed:
            for v, c in zip(tup, coded):
                if c:
                    bw.write(0 if v >= 0 else 1, 1)
        if cb == A.ESC_HCB:
            for v in tup:
                if abs(v) >= 16:
                    E._write_escape(bw, abs(v))
    br = BitReader(bw.getvalue())
    got = []
    for i in range(0, len(vals), dim):
        tup = A.unpack_index(cb, huff.decode(br))
        if not signed:
            tup = [(-v if v and br.read1() else v) for v in tup]
        if cb == A.ESC_HCB:
            tup = [int(np.sign(v)) * _read_escape(br)
                   if abs(v) == 16 else v for v in tup]
        got.extend(tup)
    assert got == [int(v) for v in vals]


def test_scalefactor_codebook_roundtrip(rng):
    from nrsc5_tpu.audio.bitio import BitReader, BitWriter
    from nrsc5_tpu.audio.hdc_decoder import SF_HUFF
    deltas = rng.integers(-60, 61, 200)
    bw = BitWriter()
    for d in deltas:
        SF_HUFF.encode(bw, int(d) + A.SF_CENTER)
    br = BitReader(bw.getvalue())
    got = [SF_HUFF.decode(br) - A.SF_CENTER for _ in deltas]
    assert got == [int(d) for d in deltas]


def _band_db(sig, lo, hi, n=16384, skip=6000):
    seg = sig[skip:skip + n] * np.hanning(n)
    E = np.abs(np.fft.rfft(seg)) ** 2
    fr = np.fft.rfftfreq(n, 1 / SR)
    m = (fr >= lo) & (fr < hi)
    return 10 * np.log10(E[m].sum() + 1e-12)


def test_sbr_roundtrip_band_energies(rng):
    """Full-bandwidth input: the SBR fill element must reconstruct the
    high-band spectral envelope (parametric, not waveform-exact) while
    the core band stays waveform-accurate."""
    from nrsc5_tpu.audio.sbr import derive_tables
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder as E

    x = _music_like(12 * 2048, rng, lp_hz=18000.0)
    stereo = np.stack([x, x], axis=-1)
    enc = HDCEncoder(2, sbr=True)
    dec = HDCDecoder()
    outs = []
    for f in range(12):
        out = dec.decode(enc.encode_frame(stereo[f * 2048:(f + 1) * 2048]))
        assert out is not None, f
        outs.append(out)
    assert dec._had_sbr
    y = np.concatenate(outs).reshape(-1, 2)[:, 0].astype(np.float64) / 32768

    ft = enc._sbr_ft
    kx_hz, k2_hz = ft.kx * SR / 128.0, ft.k2 * SR / 128.0
    ref = np.roll(x, enc.CODEC_LATENCY)

    # core band: waveform SNR (lowpass both to below the crossover)
    n = 16384
    seg, r = y[6000:6000 + n], ref[6000:6000 + n]
    for arr in (seg, r):
        pass
    W = np.fft.rfft(seg)
    Wr = np.fft.rfft(r)
    fw = np.fft.rfftfreq(n, 1 / SR)
    W[fw > kx_hz - 400] = 0
    Wr[fw > kx_hz - 400] = 0
    sl, rl = np.fft.irfft(W), np.fft.irfft(Wr)
    err = sl - rl
    snr = 10 * np.log10(np.dot(rl, rl) / max(np.dot(err, err), 1e-12))
    assert snr > 28.0, f"core-band SNR {snr:.1f} dB"

    # SBR bands: energy envelope within tolerance
    edges = np.linspace(kx_hz, k2_hz, 5)
    for lo, hi in zip(edges[:-1], edges[1:]):
        d = _band_db(y, lo, hi) - _band_db(ref, lo, hi)
        assert abs(d) < 5.0, f"band {lo:.0f}-{hi:.0f} Hz off by {d:.1f} dB"
    # above the SBR stop frequency: silent
    assert _band_db(y, k2_hz + 700, 20000) < _band_db(ref, kx_hz, k2_hz) - 30


def test_sbr_mono(rng):
    """Mono SCE path incl. the HDC extra bit before sbr_grid
    (patch:577-582)."""
    x = _music_like(12 * 2048, rng, lp_hz=15000.0)
    enc = HDCEncoder(1, sbr=True)
    dec = HDCDecoder()
    outs = []
    for f in range(12):
        out = dec.decode(enc.encode_frame(x[f * 2048:(f + 1) * 2048, None]))
        assert out is not None, f
        outs.append(out)
    assert dec._had_sbr
    y = np.concatenate(outs).reshape(-1, 2)[:, 0].astype(np.float64) / 32768
    ref = np.roll(x, enc.CODEC_LATENCY)
    d = _band_db(y, 7000, 12000) - _band_db(ref, 7000, 12000)
    assert abs(d) < 5.0, f"mono SBR band off by {d:.1f} dB"


def test_roundtrip_deep_floor(rng):
    """floor_db=-100 keeps bands spanning >2^15 peak ratios; the encoder
    must clamp scalefactors to the ±60 dpcm range BEFORE quantizing so
    the written sf always matches the quantization sf (round-2 review
    finding)."""
    n = 12 * 2048
    t = np.arange(n) / SR
    # loud low tone + very quiet high tone: extreme inter-band dynamics
    x = (0.8 * np.sin(2 * np.pi * 400 * t)
         + 1e-5 * np.sin(2 * np.pi * 6000 * t)).astype(np.float64)
    enc = HDCEncoder(1, floor_db=-100.0, sbr=False)
    dec = HDCDecoder()
    outs = []
    for f in range(n // 2048):
        pkt = enc.encode_frame(x[f * 2048:(f + 1) * 2048, None])
        out = dec.decode(pkt)
        assert out is not None, f"frame {f} failed to decode"
        outs.append(out)
    y = np.concatenate(outs).reshape(-1, 2).astype(np.float64)[:, 0] / 32768.0
    _, snr = _align_snr(y, x)
    assert snr > 30.0, f"deep-floor SNR {snr:.1f} dB"


def test_sbr_fixfix_eight_envelopes_rejected():
    """A FIXFIX grid advertising 8 envelopes must raise (truncating
    desynchronizes the remaining bitstream) — reference decoders error."""
    import pytest
    from nrsc5_tpu.audio.bitio import BitReader
    from nrsc5_tpu.audio.sbr import SbrData, parse_sbr_grid

    # frame_class=FIXFIX(00), tmp=11 -> 8 envelopes
    br = BitReader(bytes([0b00_11_0000, 0]))
    with pytest.raises(ValueError):
        parse_sbr_grid(br, SbrData())


def test_roundtrip_transient_short_windows(rng):
    """Transient content must drive the encoder through the full window
    state machine (ONLY_LONG -> LONG_START -> EIGHT_SHORT -> LONG_STOP)
    and still decode to aligned PCM — this is the decoder path every
    real broadcast exercises on percussive audio."""
    n_frames = 16
    x = _music_like(n_frames * 2048, rng) * 0.15
    # sharp core-band bursts every ~3 frames (band-limited below the SBR
    # crossover: the high band is parametric, so a broadband click would
    # not be waveform-comparable)
    for k in range(2, n_frames - 2, 3):
        pos = k * 2048 + 700
        t = np.arange(256)
        burst = (np.sin(2 * np.pi * 2400 * t / SR)
                 + 0.5 * np.sin(2 * np.pi * 3500 * t / SR + 1.0)) \
            * np.hanning(256)
        x[pos:pos + 256] += 0.7 * burst / np.abs(burst).max()
    np.clip(x, -1, 1, out=x)

    enc = HDCEncoder(2)
    dec = HDCDecoder()
    outs = []
    stereo = np.stack([x, x], axis=-1)
    for f in range(n_frames):
        out = dec.decode(enc.encode_frame(stereo[f * 2048:(f + 1) * 2048]))
        assert out is not None, f"frame {f} failed to decode"
        outs.append(out)

    # the state machine actually ran: shorts framed by start/stop
    assert enc.seq_counts[A.EIGHT_SHORT] >= 3, enc.seq_counts
    assert enc.seq_counts[A.LONG_START] >= 1, enc.seq_counts
    assert enc.seq_counts[A.LONG_STOP] >= 1, enc.seq_counts

    y = np.concatenate(outs).reshape(-1, 2)[:, 0].astype(np.float64) / 32768
    lag, snr = _align_snr(y, x)
    assert snr > 14.0, f"transient SNR {snr:.1f} dB (lag {lag})"


def test_long_only_content_stays_long(rng):
    """Steady content must not trip the transient detector."""
    x = _music_like(8 * 2048, rng)
    enc = HDCEncoder(1)
    dec = HDCDecoder()
    for f in range(8):
        assert dec.decode(enc.encode_frame(x[f * 2048:(f + 1) * 2048,
                                             None])) is not None
    assert enc.seq_counts[A.EIGHT_SHORT] == 0, enc.seq_counts
    assert enc.seq_counts[A.LONG_START] == 0, enc.seq_counts


def test_ms_stereo_roundtrip(rng):
    """Correlated stereo engages mid/side (whole-frame mask); the decoder
    must reconstruct both channels exactly through l=m+s / r=m-s."""
    x = _music_like(12 * 2048, rng)
    d = _music_like(12 * 2048, rng) * 0.1  # small decorrelated component
    stereo = np.stack([x + d, x - d], axis=-1)
    enc = HDCEncoder(2)
    dec = HDCDecoder()
    outs = []
    for f in range(12):
        out = dec.decode(enc.encode_frame(stereo[f * 2048:(f + 1) * 2048]))
        assert out is not None, f
        outs.append(out)
    assert enc.ms_frames >= 10, enc.ms_frames
    y = np.concatenate(outs).reshape(-1, 2).astype(np.float64) / 32768.0
    _, snr_l = _align_snr(y[:, 0], x + d)
    _, snr_r = _align_snr(y[:, 1], x - d)
    assert snr_l > 28.0 and snr_r > 28.0, (snr_l, snr_r)


def test_uncorrelated_stereo_stays_lr(rng):
    """Independent channels must not be forced through mid/side."""
    l = _music_like(6 * 2048, rng)
    r = _music_like(6 * 2048, np.random.default_rng(999))
    stereo = np.stack([l, r], axis=-1)
    enc = HDCEncoder(2)
    dec = HDCDecoder()
    for f in range(6):
        assert dec.decode(
            enc.encode_frame(stereo[f * 2048:(f + 1) * 2048])) is not None
    assert enc.ms_frames == 0, enc.ms_frames


def test_tns_filter_exact_inverse(rng):
    """The encoder's all-zero TNS filter and the decoder's all-pole pass
    must be exact inverses for any transmitted coefficient set."""
    from nrsc5_tpu.audio.hdc_decoder import IcsInfo, TnsInfo, _apply_tns

    for order in (1, 3, 7, 12):
        spec = rng.normal(0, 100, 1024).astype(np.float64)
        idxs = [int(v) for v in rng.integers(0, 16, order)]
        ics = IcsInfo(window_sequence=A.ONLY_LONG, max_sfb=47)
        ics.tns = TnsInfo(n_filt=[1], coef_res=[1],
                          filt=[[(47, order, 0, 0, idxs)]])
        orig = spec.copy()
        _apply_tns(ics, spec, decode=False)
        assert not np.allclose(spec, orig)  # the filter did something
        _apply_tns(ics, spec, decode=True)
        err = np.abs(spec - orig).max()
        assert err < 1e-6, f"order {order}: inverse error {err}"


def test_tns_roundtrip(rng):
    """Impulsive-but-not-transient content (slow attack, compact temporal
    envelope) engages TNS on long windows and still decodes cleanly."""
    n = 2048
    x = 0.02 * np.sin(2 * np.pi * 500 * np.arange(12 * n) / SR)
    for k in range(1, 11):
        t = np.arange(1400)
        env = np.concatenate([np.hanning(1600)[:800],
                              np.hanning(1200)[600:]])
        burst = env * np.sin(2 * np.pi * 1800 * t / SR)
        x[k * n + 200:k * n + 200 + 1400] += 0.45 * burst
    enc = HDCEncoder(1)
    dec = HDCDecoder()
    outs = []
    for f in range(12):
        out = dec.decode(enc.encode_frame(x[f * n:(f + 1) * n, None]))
        assert out is not None, f
        outs.append(out)
    assert enc.tns_channels >= 4, (enc.tns_channels, enc.seq_counts)
    y = np.concatenate(outs).reshape(-1, 2)[:, 0].astype(np.float64) / 32768
    lat = enc.CODEC_LATENCY
    m = 9 * n
    err = y[lat:lat + m] - x[:m]
    snr = 10 * np.log10((x[:m] ** 2).sum() / max((err ** 2).sum(), 1e-12))
    assert snr > 25.0, f"TNS roundtrip SNR {snr:.1f} dB"


def test_pns_roundtrip_noise_floor(rng):
    """Bands below the coding floor carry noise substitution (NOISE_HCB):
    the decoder must regenerate them at the transmitted energy instead of
    leaving silence (parametric — compare band energies, not waveforms)."""
    n, n_frames = 2048, 16
    N = n_frames * n
    t = np.arange(N) / SR
    x = 0.5 * np.sin(2 * np.pi * 500 * t)
    w = rng.normal(size=N)
    W = np.fft.rfft(w)
    f = np.fft.rfftfreq(N, 1 / SR)
    W[(f < 1000) | (f > 5000)] = 0
    noise = np.fft.irfft(W, N)
    x += 10 ** (-60 / 20) * 0.5 * noise / np.sqrt((noise ** 2).mean())

    enc = HDCEncoder(1, sbr=False)
    dec = HDCDecoder()
    outs = []
    for k in range(n_frames):
        out = dec.decode(enc.encode_frame(x[k * n:(k + 1) * n, None]))
        assert out is not None, k
        outs.append(out)
    assert enc.pns_bands > 50, enc.pns_bands
    y = np.concatenate(outs).reshape(-1, 2)[:, 0].astype(np.float64) / 32768
    y = y[enc.CODEC_LATENCY:]
    assert abs(_band_db(y, 1500, 4000) - _band_db(x, 1500, 4000)) < 3.0
    assert abs(_band_db(y, 400, 600) - _band_db(x, 400, 600)) < 1.0

    # with PNS off those bands must be silent (the old floor behavior)
    enc2 = HDCEncoder(1, sbr=False, pns=False)
    dec2 = HDCDecoder()
    outs2 = [np.asarray(dec2.decode(enc2.encode_frame(
        x[k * n:(k + 1) * n, None]))) for k in range(n_frames)]
    assert enc2.pns_bands == 0
    y2 = np.concatenate(outs2).reshape(-1, 2)[:, 0] / 32768.0
    y2 = y2[enc2.CODEC_LATENCY:]
    # (the remaining floor is the tone's own quantization noise)
    assert _band_db(y2, 1500, 4000) < _band_db(x, 1500, 4000) - 12.0


@pytest.mark.parametrize("flip", [False, True])
def test_intensity_stereo_roundtrip(rng, flip):
    """Scaled-copy right channel codes its upper bands as intensity
    positions only (in-phase INTENSITY_HCB / out-of-phase INTENSITY_HCB2);
    the decoder rebuilds them from the left channel's spectrum."""
    n = 2048
    x = _music_like(12 * n, rng)
    scale = -0.6 if flip else 0.6
    stereo = np.stack([x, scale * x], axis=-1)
    enc = HDCEncoder(2, ms=False)  # force L/R so intensity engages
    dec = HDCDecoder()
    outs = []
    for f in range(12):
        out = dec.decode(enc.encode_frame(stereo[f * n:(f + 1) * n]))
        assert out is not None, f
        outs.append(out)
    assert enc.is_bands > 50, enc.is_bands
    assert enc.ms_frames == 0
    y = np.concatenate(outs).reshape(-1, 2).astype(np.float64) / 32768.0
    _, snr_l = _align_snr(y[:, 0], x)
    _, snr_r = _align_snr(y[:, 1], scale * x)
    assert snr_l > 28.0 and snr_r > 28.0, (snr_l, snr_r)


@pytest.mark.parametrize("ms,pns,intensity", [
    (True, True, True), (True, True, False), (True, False, True),
    (False, True, True), (False, False, True), (True, False, False),
])
def test_tool_interaction_roundtrips(rng, ms, pns, intensity):
    """Factorial stereo-tool interactions: every tool combination must
    decode both channels cleanly.  Guards the inversion-order rules (TNS
    on L/R before M/S; no PNS inside M/S frames; no intensity on TNS
    frames) — each rule, if broken, destroys the right channel."""
    n = 2048
    t = np.arange(14 * n) / SR
    # bed + slow-attack bursts (TNS triggers) + band-limited side content
    x = 0.25 * np.sin(2 * np.pi * 500 * t)
    for k in range(1, 12, 2):
        env = np.concatenate([np.hanning(1600)[:800], np.hanning(1200)[600:]])
        x[k * n + 200:k * n + 1600] += 0.4 * env * np.sin(
            2 * np.pi * 1800 * t[:1400])
    d = 0.08 * np.sin(2 * np.pi * 300 * t)  # low-band decorrelation
    left, right = x + d, x - d
    stereo = np.stack([left, right], axis=-1)

    enc = HDCEncoder(2, ms=ms, pns=pns, intensity=intensity)
    dec = HDCDecoder()
    outs = []
    for f in range(14):
        out = dec.decode(enc.encode_frame(stereo[f * n:(f + 1) * n]))
        assert out is not None, f
        outs.append(out)
    y = np.concatenate(outs).reshape(-1, 2).astype(np.float64) / 32768.0
    lat = enc.CODEC_LATENCY
    m = 11 * n
    for ch, ref in ((0, left), (1, right)):
        err = y[lat:lat + m, ch] - ref[:m]
        snr = 10 * np.log10((ref[:m] ** 2).sum()
                            / max((err ** 2).sum(), 1e-12))
        assert snr > 18.0, \
            f"ms={ms} pns={pns} is={intensity} ch{ch}: {snr:.1f} dB " \
            f"(tns={enc.tns_channels} msf={enc.ms_frames} " \
            f"isb={enc.is_bands} pnsb={enc.pns_bands})"


def test_native_spectral_parser_matches_python(rng):
    """The C huffman section parser must be bit-identical to the pure
    Python one, on clean packets AND under random corruption (both must
    accept/reject identically and yield the same PCM)."""
    import nrsc5_tpu.audio.hdc_decoder as hd
    from nrsc5_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    n = 2048
    x = _music_like(10 * n, rng)
    stereo = np.stack([x, 0.6 * x], axis=-1)
    enc = HDCEncoder(2)
    pkts = [enc.encode_frame(stereo[f * n:(f + 1) * n]) for f in range(10)]
    # add corrupted variants (bit flips in the spectral region)
    corrupted = []
    for p in pkts:
        b = bytearray(p)
        for _ in range(3):
            i = int(rng.integers(8, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        corrupted.append(bytes(b))

    def run(use_native):
        saved = hd._native
        hd._native = native if use_native else None
        try:
            dec = HDCDecoder()
            out = []
            for p in pkts + corrupted:
                r = dec.decode(p)
                out.append(None if r is None else r.tobytes())
            return out
        finally:
            hd._native = saved

    a, b = run(True), run(False)
    assert a == b, [i for i, (u, v) in enumerate(zip(a, b)) if u != v]


def test_native_ics_matches_python(rng):
    """The single-call native ICS parser (nrsc5_hdc_ics: global gain +
    sections + scale factors + spectral) must be bit-identical to the
    pure-Python parse across content exercising every codebook family
    (PNS, intensity, M/S, short windows, mono), on clean AND corrupted
    packets — identical accept/reject and identical parse internals."""
    import nrsc5_tpu.audio.hdc_decoder as hd
    from nrsc5_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    n = 2048
    x = _music_like(16 * n, rng)
    # transient bursts force EIGHT_SHORT frames
    for k in (3, 9):
        x[k * n + 500:k * n + 900] += 0.5 * np.hanning(400) * rng.normal(
            size=400)
    d = 0.1 * _music_like(16 * n, rng, lp_hz=800.0)
    stereo = np.stack([x + d, x - d], axis=-1)

    cases = []
    enc = HDCEncoder(2, pns=True, intensity=True, ms=True)
    cases += [enc.encode_frame(stereo[f * n:(f + 1) * n]) for f in range(16)]
    encm = HDCEncoder(1, pns=True)
    cases += [encm.encode_frame(x[f * n:(f + 1) * n, None])
              for f in range(8)]
    for p in list(cases[:12]):
        b = bytearray(p)
        for _ in range(4):
            i = int(rng.integers(4, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
        cases.append(bytes(b))

    def run(use_native):
        saved = hd._native
        hd._native = native if use_native else None
        try:
            dec = HDCDecoder()
            out = []
            for p in cases:
                try:
                    specs, ics1, sbr = dec.parse(p)
                    out.append((
                        [s.tobytes() for s in specs],
                        None if ics1.sfb_cb is None
                        else ics1.sfb_cb.tobytes(),
                        None if ics1.scale_factors is None
                        else np.asarray(ics1.scale_factors,
                                        np.int64).tobytes()))
                except Exception as e:  # noqa: BLE001
                    out.append(("raised", type(e).__name__ != ""))
            return out
        finally:
            hd._native = saved

    a, b = run(True), run(False)
    bad = [i for i, (u, v) in enumerate(zip(a, b)) if u != v]
    assert not bad, bad
    # at least one short-window and one rejected packet actually occurred
    assert any(isinstance(r, tuple) and r[0] == "raised" for r in a)
