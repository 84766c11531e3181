"""Batched device audio decode (audio/batch.py) vs the host decoder.

The device stage must be a drop-in numerical twin of hdc_decoder +
sbr.SBRDecoder: same packets, same PCM (float32 arithmetic vs the
host's float64 — bounds are SNR, not bit-equality).
"""

from __future__ import annotations

import numpy as np
import pytest
from numpy.fft import irfft, rfft

from nrsc5_tpu.audio.batch import BatchedAudioDecoder
from nrsc5_tpu.audio.hdc_decoder import HDCDecoder
from nrsc5_tpu.tx.hdc_encoder import HDCEncoder

FS = 44100


def _packets(n_frames, seed=3, sbr=True, channels=2, transients=False,
             pns=False):
    rng = np.random.default_rng(seed)
    n = n_frames * 2048
    t = np.arange(n) / FS
    S2 = rfft(rng.standard_normal(n))
    f = np.arange(len(S2)) * FS / n
    sig = 0.4 * np.sin(2 * np.pi * (300 + 37 * seed) * t) + \
        0.1 * irfft(np.where((f > 4000) & (f < 13000), S2, 0), n)
    pcm = np.stack([sig, sig * 0.85], -1)[:, :channels] * 0.7
    if transients:
        # real attacks: quiet background + sharp core-band bursts, so
        # the encoder's detector (12x block-energy step) actually fires
        # and the stream carries EIGHT_SHORT windows + transient grids
        pcm *= 0.1
        for hit in range(2, n_frames, 3):
            pos = hit * 2048 + 700
            tt = np.arange(256)
            burst = (np.sin(2 * np.pi * 2400 * tt / FS)
                     + 0.5 * np.sin(2 * np.pi * 3500 * tt / FS + 1.0)) \
                * np.hanning(256)
            pcm[pos:pos + 256] += \
                (0.7 * burst / np.abs(burst).max())[:, None]
    enc = HDCEncoder(channels=channels, sbr=sbr, pns=pns)
    return [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(n_frames)]


def _host_decode(pkts):
    dec = HDCDecoder()
    return np.concatenate(
        [dec.decode(p).reshape(-1, 2) for p in pkts]).astype(np.float64)


def _snr(a, b):
    e = ((a - b) ** 2).sum()
    return 10 * np.log10((a ** 2).sum() / max(e, 1e-30))


def test_batch_matches_host_sbr():
    P, K = 2, 8
    all_pkts = [_packets(K, seed=3 + p) for p in range(P)]
    bat = BatchedAudioDecoder(P)
    out = bat.decode(all_pkts).astype(np.float64)
    for p in range(P):
        host = _host_decode(all_pkts[p])
        # skip the first two (near-silent ramp-in) packets
        assert _snr(host[2 * 2048:], out[p, 2 * 2048:]) > 60.0


def test_batch_matches_host_core_only():
    pkts = _packets(8, sbr=False)
    bat = BatchedAudioDecoder(1)
    out = bat.decode([pkts]).astype(np.float64)[0]
    host = _host_decode(pkts)
    assert _snr(host[2 * 2048:], out[2 * 2048:]) > 60.0


def test_batch_short_windows_and_mono():
    pkts = _packets(9, seed=5, channels=1, transients=True)
    bat = BatchedAudioDecoder(1)
    out = bat.decode([pkts]).astype(np.float64)[0]
    host = _host_decode(pkts)
    assert _snr(host[2 * 2048:], out[2 * 2048:]) > 55.0


def test_batch_streaming_state_carry():
    """Two K=4 calls must equal one K=8 call (carried state exactness)."""
    pkts = _packets(8, seed=9)
    one = BatchedAudioDecoder(1).decode([pkts]).astype(np.int64)[0]
    bat = BatchedAudioDecoder(1)
    two = np.concatenate([bat.decode([pkts[:4]])[0],
                          bat.decode([pkts[4:]])[0]]).astype(np.int64)
    assert np.abs(one - two).max() <= 1  # int16 rounding of f32 ties


def test_batch_corrupt_packet_isolated():
    P, K = 2, 6
    good = [_packets(K, seed=11 + p) for p in range(P)]
    bad = [list(g) for g in good]
    pkt = bytearray(bad[0][3])
    pkt[len(pkt) // 2] ^= 0xFF
    bad[0][3] = bytes(pkt)
    bat = BatchedAudioDecoder(P)
    out = bat.decode(bad)
    # program 1 untouched: must still match its host decode
    host1 = _host_decode(good[1])
    assert _snr(host1[2 * 2048:], out[1, 2 * 2048:].astype(np.float64)) \
        > 60.0


def test_batch_pns_no_crash():
    rng = np.random.default_rng(2)
    n = 6 * 2048
    t = np.arange(n) / FS
    pcm = (0.4 * np.sin(2 * np.pi * 500 * t)
           + 0.002 * rng.standard_normal(n)).reshape(-1, 1)
    pcm = np.repeat(pcm, 2, axis=1)
    enc = HDCEncoder(channels=2, sbr=True, pns=True, floor_db=-40.0)
    pkts = [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(6)]
    out = BatchedAudioDecoder(1).decode([pkts])
    assert out.shape == (1, 6 * 2048, 2)
    assert np.abs(out[0, 4096:]).max() > 100  # non-silent


def test_fleet_audio_through_serving(rng):
    """End-to-end: modulated FM stations -> MultiStationReceiver ->
    FleetAudioDecoder -> batched device PCM, matching the host-codec
    session PCM for the same stream."""
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame

    # audio content -> HDC packets -> P1 frames
    t = np.arange(12 * 2048) / FS
    tone = np.stack([0.4 * np.sin(2 * np.pi * 440 * t)] * 2, -1)
    enc = HDCEncoder(channels=2, sbr=True, pns=False)
    hdc_pkts = [enc.encode_frame(tone[k * 2048:(k + 1) * 2048])
                for k in range(12)]
    # 2 HDC packets per L1 block, 32 per P1 frame -> pad the list
    per_frame = 32
    n_frames = 3
    pool = (hdc_pkts * ((n_frames * per_frame) // len(hdc_pkts) + 1))
    mats = []
    for f in range(n_frames):
        pkts = pool[f * per_frame:(f + 1) * per_frame]
        p1 = build_p1_fm_frame(pkts, program=0, pdu_seq=f % 8,
                               seq=(f * 32) % 64)
        mats.append(build_pm_matrix(p1, np.zeros((16, 80), np.uint8)))
    sig = modulate_fm(np.concatenate(mats),
                      np.tile(np.arange(16), n_frames), 1)
    buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
    buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig

    events = {0: [], 1: []}
    fleet = FleetAudioDecoder(
        2, lambda st, ev: events[st].append(ev), k=4)
    rx = MultiStationReceiver(2, fleet.wrap, frames_per_dispatch=1,
                              hdc_factory=None)
    for lo in range(0, len(buf), 300000):
        for i in range(2):
            rx.push(i, buf[lo:lo + 300000])
    rx.flush()
    fleet.flush()

    for i in range(2):
        audio = [e for e in events[i] if e.type == EventType.AUDIO]
        assert len(audio) >= 48, len(audio)
        pcm = np.concatenate([np.asarray(e.samples) for e in audio])
        assert np.abs(pcm).max() > 1000, "silent fleet audio"
        # host-codec reference for the same packet stream
        host = HDCDecoder()
        hdcs = [e.data for e in events[i]
                if e.type == EventType.HDC and not e.crc_error]
        ref = np.concatenate(
            [host.decode(p).reshape(-1) for p in hdcs[:len(audio)]])
        a = pcm[8 * 4096:min(len(pcm), len(ref))].astype(np.float64)
        b = ref[8 * 4096:min(len(pcm), len(ref))].astype(np.float64)
        snr = 10 * np.log10((b ** 2).sum()
                            / max(((a - b) ** 2).sum(), 1e-30))
        assert snr > 50.0, snr


def test_fleet_starving_station_padded():
    """A station that stops producing packets must not stall the fleet:
    once its lag exceeds max_lag the lagging queue is silence-padded,
    the healthy stations keep decoding, the starving station's padded
    slots emit real silence frames (reference src/output.c:148-162
    per-missing-packet silence), and no queue grows without bound."""
    from nrsc5_tpu.api.events import EventType, make
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder

    events = {0: [], 1: []}
    fleet = FleetAudioDecoder(2, lambda st, ev: events[st].append(ev),
                              k=4, max_lag=8)
    pkts = _packets(12, seed=21)
    for p in pkts:  # station 1 never produces a packet
        fleet.wrap(0, make(EventType.HDC, program=0, data=p,
                           crc_error=False))
    fleet.flush()
    a0 = [e for e in events[0] if e.type == EventType.AUDIO]
    a1 = [e for e in events[1] if e.type == EventType.AUDIO]
    assert len(a0) == 12  # every real packet decoded
    assert len(a1) == 4   # one mid-stream padded batch of silence
    assert max(len(q) for q in fleet._queues) == 0  # backlog bounded
    pcm0 = np.concatenate([np.asarray(e.samples) for e in a0])
    pcm1 = np.concatenate([np.asarray(e.samples) for e in a1])
    assert np.abs(pcm0[4 * 4096:]).max() > 1000
    assert np.abs(pcm1).max() == 0
    fleet.close()


def test_batch_interpol_freq_off():
    """bs_interpol_freq=0 headers (per-band averaged gains,
    §4.6.18.7.2) run on the device path and match the host decoder."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    hdr = SbrHeader(start_freq=8, stop_freq=7, amp_res=0, xover_band=2,
                    interpol_freq=0)
    rng = np.random.default_rng(7)
    n = 8 * 2048
    t = np.arange(n) / FS
    S2 = rfft(rng.standard_normal(n))
    f = np.arange(len(S2)) * FS / n
    sig = 0.4 * np.sin(2 * np.pi * 700 * t) + \
        0.1 * irfft(np.where((f > 4000) & (f < 13000), S2, 0), n)
    pcm = np.stack([sig, sig * 0.85], -1) * 0.7
    enc = HDCEncoder(channels=2, sbr=True, pns=False, sbr_header=hdr)
    pkts = [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(8)]
    host = _host_decode(pkts)
    out = BatchedAudioDecoder(1).decode([pkts]).astype(np.float64)[0]
    assert _snr(host[2 * 2048:], out[2 * 2048:]) > 55.0


def test_batch_mixed_headers_fallback():
    """A fleet with two different SBR headers must not crash: the batch
    header's program decodes fully; the other program's packets fall
    back to zeroed HF (core-only audio, non-silent)."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    pkts0 = _packets(8, seed=31)
    hdr1 = SbrHeader(start_freq=7, stop_freq=6, amp_res=0, xover_band=2)
    rng = np.random.default_rng(8)
    n = 8 * 2048
    t = np.arange(n) / FS
    sig = 0.4 * np.sin(2 * np.pi * 520 * t) \
        + 0.05 * rng.standard_normal(n)
    pcm = np.stack([sig, sig * 0.85], -1) * 0.7
    enc1 = HDCEncoder(channels=2, sbr=True, pns=False, sbr_header=hdr1)
    pkts1 = [enc1.encode_frame(pcm[k * 2048:(k + 1) * 2048])
             for k in range(8)]
    bat = BatchedAudioDecoder(2)
    out = bat.decode([pkts0, pkts1]).astype(np.float64)
    assert np.isfinite(out).all()
    host0 = _host_decode(pkts0)
    # this seed's content lands at 47 dB even decoded solo (f32 vs f64);
    # the assertion pins that the mixed batch does not degrade it
    assert _snr(host0[2 * 2048:], out[0, 2 * 2048:]) > 45.0
    assert np.abs(out[1, 4 * 2048:]).max() > 1000  # core-only, audible


def test_fleet_audio_checkpoint_resume(tmp_path):
    """Cross-process-style save/load mid-stream: decode half through
    fleet A, save (undecoded queue included), load into a fresh fleet B,
    decode the rest — the concatenated PCM must equal an uninterrupted
    decode (int16 rounding tolerance, like the state-carry test)."""
    from nrsc5_tpu.api.events import EventType, make
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder

    pkts = _packets(12, seed=17)
    path = str(tmp_path / "fleet_audio.npz")

    def hdc(p):
        return make(EventType.HDC, program=0, data=p, crc_error=False)

    ev_a = []
    fa = FleetAudioDecoder(1, lambda st, ev: ev_a.append(ev), k=4)
    for p in pkts[:6]:  # one batch dispatched, 2 packets queued
        fa.wrap(0, hdc(p))
    fa.save(path)
    fa.close()

    ev_b = []
    fb = FleetAudioDecoder(1, lambda st, ev: ev_b.append(ev), k=4)
    fb.load(path)
    for p in pkts[6:]:
        fb.wrap(0, hdc(p))
    fb.flush()
    fb.close()

    audio = [e for e in ev_a + ev_b if e.type == EventType.AUDIO]
    assert len(audio) == 12
    pcm = np.concatenate([np.asarray(e.samples) for e in audio]) \
        .astype(np.int64)
    one = BatchedAudioDecoder(1).decode([pkts])[0].reshape(-1) \
        .astype(np.int64)
    assert np.abs(pcm - one).max() <= 1


def test_batch_smoothing_mode():
    """bs_smoothing_mode=0 (temporal gain smoothing, §4.6.18.7.5): the
    device 5-tap trajectory filter must match the host decoder.  The
    filter's own effect is ~36 dB below the signal (measured
    filter-vs-identity), so a >55 dB device==host bound discriminates
    wrong/missing smoothing; streaming state carry must also hold."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    hdr = SbrHeader(start_freq=8, stop_freq=7, amp_res=0, xover_band=2,
                    smoothing_mode=0)
    rng = np.random.default_rng(6)
    n = 10 * 2048
    t = np.arange(n) / FS
    S2 = rfft(rng.standard_normal(n))
    f = np.arange(len(S2)) * FS / n
    hi = irfft(np.where((f > 6000) & (f < 13000), S2, 0), n)
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 13.0 * t)  # moving envelopes
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.35 * hi * am
    pcm = np.stack([sig, sig * 0.85], -1) * 0.7
    enc = HDCEncoder(channels=2, sbr=True, pns=False, sbr_header=hdr)
    pkts = [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(10)]
    host = _host_decode(pkts)
    out = BatchedAudioDecoder(1).decode([pkts]).astype(np.float64)[0]
    assert _snr(host[2 * 2048:], out[2 * 2048:]) > 55.0
    # streaming split must carry the trajectory history (different K
    # compiles retile the 5-tap sums, so allow a few int16 LSB ~ -84 dB
    # instead of the unsmoothed path's rounding-tie bound)
    bat = BatchedAudioDecoder(1)
    two = np.concatenate([bat.decode([pkts[:5]])[0],
                          bat.decode([pkts[5:]])[0]]).astype(np.int64)
    one = BatchedAudioDecoder(1).decode([pkts])[0].astype(np.int64)
    assert np.abs(one - two).max() <= 8


def test_batch_smoothing_checkpoint_resume(tmp_path):
    """The smoothing trajectory history must survive checkpoint/restore:
    split with a save/load across instances == uninterrupted decode."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    hdr = SbrHeader(start_freq=8, stop_freq=7, amp_res=0, xover_band=2,
                    smoothing_mode=0)
    rng = np.random.default_rng(14)
    n = 8 * 2048
    t = np.arange(n) / FS
    S2 = rfft(rng.standard_normal(n))
    f = np.arange(len(S2)) * FS / n
    hi = irfft(np.where((f > 6000) & (f < 13000), S2, 0), n)
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 13.0 * t)
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.35 * hi * am
    pcm = np.stack([sig, sig * 0.85], -1) * 0.7
    enc = HDCEncoder(channels=2, sbr=True, pns=False, sbr_header=hdr)
    pkts = [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(8)]
    one = BatchedAudioDecoder(1).decode([pkts]).astype(np.int64)[0]

    import numpy as _np
    path = str(tmp_path / "smooth.npz")
    a = BatchedAudioDecoder(1)
    first = a.decode([pkts[:4]])[0]
    _np.savez(path, **a.checkpoint())
    b = BatchedAudioDecoder(1)
    b.restore(_np.load(path))
    second = b.decode([pkts[4:]])[0]
    two = np.concatenate([first, second]).astype(np.int64)
    assert np.abs(one - two).max() <= 8


def test_batch_all_corrupt_keeps_sticky_header():
    """A dispatch where every packet is corrupt (deep fade) must not
    flap the compiled device fn to the default header: the sticky
    header survives and the next good batch decodes without rebuild."""
    pkts = _packets(8, seed=41)
    bat = BatchedAudioDecoder(1)
    bat.decode([pkts[:4]])
    hdr, fn = bat._hdr, bat._fn
    out = bat.decode([[b""] * 4])  # all-corrupt batch
    # only the filterbank/QMF ring-out of the last good packet remains
    assert np.abs(out[0, 2 * 2048:]).max() == 0
    assert bat._hdr == hdr and bat._fn is fn, "header/fn flapped"
    bat.decode([pkts[4:]])
    assert bat._fn is fn


def test_fleet_shed_under_overload():
    """max_pending bounds the decode backlog: batches past it are shed
    as in-order silence frames (no device dispatch, no memory growth);
    flush's final batch is never shed."""
    from nrsc5_tpu.api.events import EventType, make
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder

    events = []
    fleet = FleetAudioDecoder(1, lambda st, ev: events.append(ev),
                              k=4, max_pending=0)  # shed every wrap batch
    pkts = _packets(10, seed=23)
    for p in pkts:  # two wrap-time batches shed, two packets queued
        fleet.wrap(0, make(EventType.HDC, program=0, data=p,
                           crc_error=False))
    fleet.flush()
    audio = [e for e in events if e.type == EventType.AUDIO]
    assert len(audio) == 10  # cadence preserved under shed
    shed = np.concatenate([np.asarray(e.samples) for e in audio[:8]])
    assert np.abs(shed).max() == 0  # shed slots are silence
    tail = np.concatenate([np.asarray(e.samples) for e in audio[8:]])
    assert np.abs(tail).max() > 0  # flush batch really decoded
    fleet.close()


def _transient_pcm(n_frames, seed=77, late=False):
    """Quiet background + sharp core-band bursts: drives the encoder's
    transient detector (EIGHT_SHORT windows + 2-envelope variable SBR
    grids with l_A).  ``late`` puts the attack in the second half of
    the frame (FIXVAR grid); else first half (VARFIX)."""
    rng = np.random.default_rng(seed)
    n = n_frames * 2048
    t = np.arange(n) / FS
    x = 0.04 * np.sin(2 * np.pi * 500 * t) \
        + 0.01 * rng.standard_normal(n)
    pos0 = 1500 if late else 700
    for k in range(2, n_frames - 2, 3):
        pos = k * 2048 + pos0
        tt = np.arange(256)
        burst = (np.sin(2 * np.pi * 2400 * tt / FS)
                 + 0.5 * np.sin(2 * np.pi * 3500 * tt / FS + 1.0)) \
            * np.hanning(256)
        x[pos:pos + 256] += 0.7 * burst / np.abs(burst).max()
    np.clip(x, -1, 1, out=x)
    return np.stack([x, x * 0.9], -1)


@pytest.mark.parametrize("late", [False, True])
def test_batch_transient_sbr_grids(late):
    """Transient frames carry 2-envelope variable SBR grids with l_A on
    the attack envelope (VARFIX early / FIXVAR late border): the device
    path's per-envelope delta/noise gating must match the host."""
    from nrsc5_tpu.audio.hdc_decoder import HDCDecoder as HD

    n_frames = 12
    pcm = _transient_pcm(n_frames, late=late)
    enc = HDCEncoder(channels=2, sbr=True, pns=False)
    pkts = [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(n_frames)]
    # the grids really are transient grids
    dec = HD()
    classes = set()
    for p in pkts:
        _, _, sd = dec.parse(p)
        if sd:
            for ch, d in enumerate(sd):
                dec._sbr[ch].prev_env = d.env[-1]
                dec._sbr[ch].prev_noise = d.noise[-1]
            classes.add((sd[0].frame_class, sd[0].n_env, sd[0].la))
    want_class = (1, 2, 1) if late else (2, 2, 1)  # FIXVAR / VARFIX
    assert want_class in classes, classes
    host = _host_decode(pkts)
    out = BatchedAudioDecoder(1).decode([pkts]).astype(np.float64)[0]
    assert _snr(host[2 * 2048:], out[2 * 2048:]) > 55.0


def test_batch_smoothing_transient_bypass():
    """bs_smoothing_mode=0 + transient grids: the h_smooth filter must
    bypass the l_A envelope identically on host and device (the
    ffmpeg-semantics branch both twins implement)."""
    from nrsc5_tpu.audio.sbr import SbrHeader

    hdr = SbrHeader(start_freq=8, stop_freq=7, amp_res=0, xover_band=2,
                    smoothing_mode=0)
    n_frames = 12
    pcm = _transient_pcm(n_frames, seed=31)
    enc = HDCEncoder(channels=2, sbr=True, pns=False, sbr_header=hdr)
    pkts = [enc.encode_frame(pcm[k * 2048:(k + 1) * 2048])
            for k in range(n_frames)]
    host = _host_decode(pkts)
    out = BatchedAudioDecoder(1).decode([pkts]).astype(np.float64)[0]
    assert _snr(host[2 * 2048:], out[2 * 2048:]) > 55.0


def test_fleet_audio_am_serving(rng):
    """Fleet audio is transport-agnostic: AM (MA1) stations through the
    serving receiver feed the same batched device PCM stage — real HDC
    audio packets over the AM chain decode to the host decoder's PCM."""
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    # mono low-rate HDC content sized for AM PDUs: 4 packets of
    # 40-100 bytes per 468-byte P1 PDU (>= the 88-byte RS codeword)
    n_src = 20
    t = np.arange(n_src * 2048) / FS
    S2 = rfft(rng.standard_normal(n_src * 2048))
    f = np.arange(len(S2)) * FS / (n_src * 2048)
    lp = irfft(np.where(f < 2500, S2, 0), n_src * 2048)
    sig = (0.3 * np.sin(2 * np.pi * 330 * t) + 0.1 * lp).reshape(-1, 1)
    enc = HDCEncoder(channels=1, sbr=False, pns=False,
                     target_maxq=6, floor_db=-35.0)
    hdc_pkts = [enc.encode_frame(sig[k * 2048:(k + 1) * 2048])
                for k in range(n_src)]
    hdc_pkts = [p for p in hdc_pkts if 40 <= len(p) <= 100]
    assert len(hdc_pkts) >= 4, [len(p) for p in hdc_pkts]

    n = 7
    pool = hdc_pkts * (n * 32 // len(hdc_pkts) + 1)
    p1_frames = []
    gi = 0
    for f in range(n):
        sub = []
        for b in range(8):
            pkts = pool[gi:gi + 4]
            gi += 4
            sub.append(build_p1_am_frame(pkts, 0, (f * 8 + b) % 8,
                                         ((f * 8 + b) * 4) % 64))
        p1_frames.append(np.stack(sub))
    p3 = rng.integers(0, 2, (n, C.P3_FRAME_LEN_MA1)).astype(np.uint8)
    mats = EAM.interleave_frames(
        [EAM.encode_p1_am(p1_frames[f]) for f in range(n)],
        [EAM.encode_p3_am(p3[f], False) for f in range(n)], False)
    pids_codes = np.stack([EAM.encode_pids_am(
        rng.integers(0, 2, 80).astype(np.uint8)) for _ in range(n * 8)])
    ref = np.stack([EAM.am_ref_bits(b % 8, 1) for b in range(n * 8)])
    sig = modulate_am(mats, pids_codes, ref, False)
    buf = np.zeros(len(sig) + C.FFTCP_AM, np.complex64)
    buf[C.FFTCP_AM // 2:C.FFTCP_AM // 2 + len(sig)] = sig

    events = {0: [], 1: []}
    fleet = FleetAudioDecoder(2, lambda st, ev: events[st].append(ev),
                              k=4)
    rx = MultiStationReceiver(2, fleet.wrap, frames_per_dispatch=2,
                              mode="am", hdc_factory=None)
    for lo in range(0, len(buf), 100000):
        for i in range(2):
            rx.push(i, buf[lo:lo + 100000])
    rx.flush()
    fleet.flush()

    for i in range(2):
        audio = [e for e in events[i] if e.type == EventType.AUDIO]
        assert len(audio) >= 16, len(audio)
        pcm = np.concatenate([np.asarray(e.samples) for e in audio])
        assert np.abs(pcm).max() > 500, "silent AM fleet audio"
        host = HDCDecoder()
        hdcs = [e.data for e in events[i]
                if e.type == EventType.HDC and not e.crc_error]
        ref_pcm = np.concatenate(
            [host.decode(p).reshape(-1) for p in hdcs[:len(audio)]])
        a = pcm[4 * 4096:min(len(pcm), len(ref_pcm))].astype(np.float64)
        b = ref_pcm[4 * 4096:min(len(pcm), len(ref_pcm))] \
            .astype(np.float64)
        snr = 10 * np.log10((b ** 2).sum()
                            / max(((a - b) ** 2).sum(), 1e-30))
        assert snr > 50.0, snr


@pytest.mark.parametrize("subscribe", ["explicit", "auto"])
def test_fleet_audio_two_programs(subscribe):
    """Multi-program fleet audio (reference: one codec per subscribed
    program, src/output.c:100-168): a two-program P1 frame (two audio
    PDUs, HEF program numbers) through the serving receiver emits BOTH
    programs' PCM per station, each matching the host decoder on its
    own HDC stream — with explicit subscription and with auto
    program discovery."""
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import build_audio_pdu, pack_frame

    n_frames = 3
    t = np.arange(n_frames * 32 * 2048) / FS
    pk = []
    for f0 in (440.0, 660.0):
        enc = HDCEncoder(channels=2, sbr=True, pns=False)
        x = 0.3 * np.sin(2 * np.pi * f0 * t)
        stereo = np.stack([x, x], axis=-1)
        pk.append([enc.encode_frame(stereo[i * 2048:(i + 1) * 2048])
                   for i in range(n_frames * 32)])

    mats = []
    pids = np.zeros((16, 80), np.uint8)
    for f in range(n_frames):
        pdus = [build_audio_pdu(pk[p][f * 32:(f + 1) * 32], program=p,
                                pdu_seq=f % 8, seq=(f * 32) % 64)
                for p in (0, 1)]
        both = np.concatenate(pdus)
        assert len(both) <= C.MAX_PDU_LEN, len(both)
        both = np.concatenate(
            [both, np.zeros(C.MAX_PDU_LEN - len(both), np.uint8)])
        mats.append(build_pm_matrix(
            pack_frame(both, C.P1_FRAME_LEN_FM, C.PCI_AUDIO), pids))
    sig = modulate_fm(np.concatenate(mats),
                      np.tile(np.arange(16), n_frames), 1)
    buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
    buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig

    events = []
    kw = dict(programs=(0, 1)) if subscribe == "explicit" \
        else dict(programs="auto", max_programs=2)
    fleet = FleetAudioDecoder(1, lambda st, ev: events.append(ev),
                              k=4, **kw)
    rx = MultiStationReceiver(1, fleet.wrap, frames_per_dispatch=1,
                              hdc_factory=None)
    for lo in range(0, len(buf), 300000):
        rx.push(0, buf[lo:lo + 300000])
    rx.flush()
    fleet.flush()

    for p in (0, 1):
        audio = [e for e in events if e.type == EventType.AUDIO
                 and e.program == p]
        assert len(audio) >= 24, (p, len(audio))
        pcm = np.concatenate([np.asarray(e.samples) for e in audio])
        assert np.abs(pcm).max() > 1000, f"silent program {p}"
        host = HDCDecoder()
        hdcs = [e.data for e in events if e.type == EventType.HDC
                and e.program == p and not e.crc_error]
        ref = np.concatenate(
            [host.decode(q).reshape(-1) for q in hdcs[:len(audio)]])
        m = min(len(pcm), len(ref))
        a = pcm[8 * 4096:m].astype(np.float64)
        b = ref[8 * 4096:m].astype(np.float64)
        snr = 10 * np.log10((b ** 2).sum()
                            / max(((a - b) ** 2).sum(), 1e-30))
        assert snr > 50.0, (p, snr)
