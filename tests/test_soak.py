"""Long-soak serving stability: ~95 s of drifting FM signal (64 P1 frames)
streamed through serve + fleet audio in bounded memory.

Pins the wraparound/stability properties nothing short can reach:
  - elastic-buffer seq wraparound (ELASTIC_BUFFER_LEN=64 — the 2048-packet
    stream wraps the 6-bit packet seq 32 times; reference src/output.c:85-99)
  - PDU-seq wrap (pdu_seq cycles 0..7 eight times)
  - the serve BER watchdog must NOT fire on a clean (if drifting) signal
  - the samperr feedback loop holds the station queue bounded under
    +50 ppm sample-clock drift (reference src/sync.c:426-463)
  - fleet-audio queues stay bounded while decoding every packet
"""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import EventType

FS = 44100


def _drift_chunks(chunks, ppm: float, cfo_hz: float, snr_db: float, rng,
                  rate: float = C.SAMPLE_RATE_CS16_FM):
    """Stream a constant sample-clock error + CFO + AWGN over an iterator of
    complex chunks without materializing the whole signal (the streaming twin
    of tx.channel.clock_drift/impair; linear interpolation, stateful across
    chunk boundaries)."""
    scale = 1.0 + ppm * 1e-6
    buf = np.zeros(0, np.complex64)
    consumed = 0  # absolute input index of buf[0]
    next_t = 0.0  # absolute input time of the next output sample
    n_out = 0  # absolute output index (for the CFO phase ramp)
    w = 2.0 * np.pi * cfo_hz / rate
    for c in chunks:
        buf = np.concatenate([buf, np.asarray(c, np.complex64)])
        t_max = consumed + len(buf) - 1
        n = int((t_max - next_t) / scale)
        if n <= 0:
            continue
        t = next_t + np.arange(n, dtype=np.float64) * scale
        idx = t - consumed
        base = np.arange(len(buf), dtype=np.float64)
        out = (np.interp(idx, base, buf.real)
               + 1j * np.interp(idx, base, buf.imag))
        if cfo_hz:
            out = out * np.exp(1j * w * (n_out + np.arange(n)))
        p_sig = np.mean(np.abs(out) ** 2)
        p_noise = p_sig / (10 ** (snr_db / 10))
        out = out + (rng.normal(0, np.sqrt(p_noise / 2), (n, 2))
                     .astype(np.float32).view(np.complex64)[:, 0])
        yield out.astype(np.complex64)
        next_t += n * scale
        n_out += n
        keep_from = max(int(next_t - consumed), 0)
        buf = buf[keep_from:]
        consumed += keep_from


@pytest.mark.soak
def test_long_soak_serve_fleet_audio(rng):
    """64 P1 frames with +50 ppm drift through MultiStationReceiver +
    FleetAudioDecoder: zero HDC packet loss after a 2-frame warm-up, no
    watchdog relock, bounded station/fleet queues, continuous PCM."""
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame

    n_frames, per_frame = 64, 32
    warmup_frames = 2

    # 12 unique real HDC packets (a 440 Hz tone), cycled across the stream
    t = np.arange(12 * 2048) / FS
    tone = np.stack([0.4 * np.sin(2 * np.pi * 440 * t)] * 2, -1)
    enc = HDCEncoder(channels=2, sbr=True, pns=False)
    hdc_pkts = [enc.encode_frame(tone[k * 2048:(k + 1) * 2048])
                for k in range(12)]
    pool = set(hdc_pkts)

    def frame_mats():
        """P1 frames in chunks of 4 (bounded memory: the full 71M-sample
        capture is never materialized)."""
        g = 0
        for chunk in range(n_frames // 4):
            mats = []
            for _ in range(4):
                pkts = [hdc_pkts[(g * per_frame + k) % len(hdc_pkts)]
                        for k in range(per_frame)]
                p1 = build_p1_fm_frame(pkts, program=0, pdu_seq=g % 8,
                                       seq=(g * per_frame) % 64)
                mats.append(build_pm_matrix(
                    p1, np.zeros((16, 80), np.uint8)))
                g += 1
            sig = modulate_fm(np.concatenate(mats),
                              np.tile(np.arange(16), 4), 1)
            if chunk == 0:
                sig = np.concatenate(
                    [np.zeros(C.FFTCP_FM // 2, np.complex64), sig])
            yield sig

    events = []
    fleet = FleetAudioDecoder(1, lambda st, ev: events.append(ev), k=8)
    rx = MultiStationReceiver(1, fleet.wrap, frames_per_dispatch=2,
                              hdc_factory=None, cold_start=True)

    max_station_q = 0
    max_fleet_q = 0
    for block in _drift_chunks(frame_mats(), ppm=50.0, cfo_hz=120.0,
                               snr_db=30.0, rng=rng):
        for lo in range(0, len(block), 300000):
            rx.push(0, block[lo:lo + 300000])
            max_station_q = max(max_station_q, rx._sizes[0])
            max_fleet_q = max(max_fleet_q,
                              max(len(q) for q in fleet._queues))
    rx.flush()
    fleet.flush()

    # exactly one SYNC (the initial cold-start acquisition) and never a
    # watchdog relock / sync loss on a clean drifting signal
    kinds = {e.type for e in events}
    assert EventType.LOST_SYNC not in kinds
    assert sum(e.type == EventType.SYNC for e in events) == 1

    # zero packet loss after warm-up: every post-warm-up packet surfaced
    hdc = [e for e in events if e.type == EventType.HDC and not e.crc_error]
    assert len(hdc) >= (n_frames - warmup_frames) * per_frame, len(hdc)
    assert {e.data for e in hdc} <= pool, "corrupted packet emitted"

    # bounded queues: the samperr loop must hold the station backlog near
    # one dispatch window (~2 frames + probe overlap), not grow with time
    dispatch_window = rx._needed + rx._overlap
    assert max_station_q < 3 * dispatch_window, \
        (max_station_q, dispatch_window)
    assert max_fleet_q <= 64 + 8, max_fleet_q  # max_lag + one batch

    # continuous non-silent PCM from the device audio path
    audio = [e for e in events if e.type == EventType.AUDIO]
    assert len(audio) >= (n_frames - warmup_frames) * per_frame - 64, \
        len(audio)
    pcm = np.concatenate([np.asarray(e.samples) for e in audio])
    assert np.abs(pcm).max() > 1000, "silent soak audio"
    # no dead gaps: every 1-second window after warm-up has signal
    sec = 2 * FS  # stereo interleaved
    for lo in range(8 * 4096, len(pcm) - sec, sec):
        assert np.abs(pcm[lo:lo + sec]).max() > 100, f"silent at {lo}"


@pytest.mark.soak
def test_long_soak_am_serve(rng):
    """The AM twin: 64 MA1 frames (~95 s of signal) with -50 ppm drift +
    CFO through AM serving with cold_start=True.  Pins the AM-specific
    long-run properties: the diversity-delay pipeline staying primed
    across hundreds of subframe handoffs, the P3-margin watchdog NOT
    firing on a clean drifting carrier, PDU-seq wraparound across all 8
    subframe lanes, and a bounded station queue."""
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.serve import MultiStationReceiver

    from .capture_helpers import build_am_capture

    n_frames, per_frame = 64, 32  # 8 subframes x 4 packets
    warmup_frames = 6  # acquisition + 3-frame diversity delay
    sig, packets = build_am_capture(rng, n_frames=n_frames)
    pool = {bytes(b) for _, pk in packets for b in pk}

    bin_hz = C.SAMPLE_RATE_CS16_AM / C.FFT_AM

    def chunks():
        for lo in range(0, len(sig), 250000):
            yield sig[lo:lo + 250000]

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=2, mode="am",
                              hdc_factory=None, cold_start=True)
    max_q = 0
    for block in _drift_chunks(chunks(), ppm=-50.0,
                               cfo_hz=bin_hz + 17.0, snr_db=30.0,
                               rng=rng, rate=C.SAMPLE_RATE_CS16_AM):
        for lo in range(0, len(block), 100000):
            rx.push(0, block[lo:lo + 100000])
            max_q = max(max_q, rx._sizes[0])
    rx.flush()

    kinds = [e.type for e in events]
    assert kinds.count(EventType.SYNC) == 1, kinds[:8]
    assert EventType.LOST_SYNC not in kinds

    hdc = [e for e in events if e.type == EventType.HDC
           and not e.crc_error]
    assert len(hdc) >= (n_frames - warmup_frames) * per_frame, len(hdc)
    assert {e.data for e in hdc} <= pool, "corrupted packet emitted"

    # bounded queue under drift: near one dispatch window forever
    assert max_q < 3 * (rx._needed + rx._overlap), \
        (max_q, rx._needed + rx._overlap)


def _lot_content(tag: str) -> bytes:
    """Deterministic 640-byte payload for soak LOT file ``tag``."""
    seed = sum(tag.encode())
    return ((np.arange(640) + 37 * seed) % 256).astype(np.uint8).tobytes()


@pytest.mark.soak
@pytest.mark.nightly
@pytest.mark.skipif(not __import__("os").environ.get("NRSC5_NIGHTLY"),
                    reason="hour-scale soak tier: set NRSC5_NIGHTLY=1")
def test_nightly_soak_holes_lot(rng):
    """The hour-scale tier (VERDICT r4 item 5): 512 P1 frames (~12.7 min
    of signal) at +100 ppm sample-clock drift with THREE deliberate
    signal holes (timing jumps after frames 128/256/384 — each must trip
    the watchdog and cold-start relock) and sustained AAS/LOT traffic
    under real SIG routing.  LOT LRU churn is pinned deterministically:
    a VICTIM file receives fragments 0-8 early and its last fragment
    ~330 frames later, after >30 other files have passed through the
    12-slot cache (MAX_LOT_FILES, reference src/output.c:627-872) — it
    must NOT complete (evicted); a CONTROL twin whose last fragment
    follows promptly MUST.  Also pinned: zero HDC loss per lock segment
    after the relock warm-up, bounded station/fleet queues, bounded RSS
    growth, bit-exact completed files, non-silent audio throughout.

    Nightly tier: ~4 min wall on this 4-core box; enable with
    NRSC5_NIGHTLY=1 (pytest -m nightly)."""
    from nrsc5_tpu.audio.fleet import FleetAudioDecoder
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import aas_frame

    from .test_transport import lot_fragment, sig_table

    n_frames, per_frame = 512, 32
    hole_every = 128
    FR = 64  # LOT fragment payload bytes (the PDU PSD slot is ~176 B)
    NFRAG = 10  # 640-byte files

    t = np.arange(12 * 2048) / FS
    tone = np.stack([0.4 * np.sin(2 * np.pi * 440 * t)] * 2, -1)
    enc = HDCEncoder(channels=2, sbr=True, pns=False)
    hdc_pkts = [enc.encode_frame(tone[k * 2048:(k + 1) * 2048])
                for k in range(12)]
    pool = set(hdc_pkts)

    # ---- LOT over the FIXED DATA SUBCHANNEL (the protocol carrier
    # for 256-byte fragments — the PDU PSD slot holds ~176 B; reference
    # src/frame.c:393-514 + src/output.c:627-872).  One continuous
    # HDLC AAS stream rides BBM blocks chunked 64 B/frame:
    #   control file: frags 0,1 early + last frag ~20 frames later
    #     (must COMPLETE);
    #   victim file: frags 0,1 early + last frag ~330 frames later —
    #     by then >20 fast files have churned the 12-slot LRU, so the
    #     victim is evicted and must NOT complete;
    #   fast files: sequential 3-fragment files filling all remaining
    #     stream bandwidth (sustained completions).
    from nrsc5_tpu.transport.frame import BBM_MAGIC
    from nrsc5_tpu.tx.transport_encoder import hdlc_escape
    from nrsc5_tpu.utils.crc import fcs16_append

    SUB_LEN, SYNC_WIDTH, SYNC_BYTE = 64, 30, 0xFF

    def ccc_config() -> bytes:
        payload = bytearray([0x00])
        for i in range(4):
            length = SUB_LEN if i == 0 else 0
            payload += bytes([0, 0, length & 0xFF, length >> 8])
        return b"\x7e" + hdlc_escape(fcs16_append(bytes(payload))) \
            + b"\x7e"

    lot_seq = [0]

    def lot_aas(tag: str, lot: int, r: int) -> bytes:
        content = _lot_content(tag)
        frag = lot_fragment(
            lot, r, content[r * 256:(r + 1) * 256],
            name=f"{tag}.png" if r == 0 else None,
            size=len(content) if r == 0 else None)
        out = aas_frame(0x1001, lot_seq[0] & 0xFFFF, frag)
        lot_seq[0] += 1
        return out

    # build the AAS stream against frame-time targets (frame g consumes
    # aas bytes ~[g*64*255/259, ...) — BBM magic overhead excluded)
    aas_target = lambda g: int(g * SUB_LEN * 255 / 259)  # noqa: E731
    specials = [(30, "ctl", 90, 0), (35, "ctl", 90, 1), (52, "ctl", 90, 2),
                (60, "vic", 91, 0), (65, "vic", 91, 1), (400, "vic", 91, 2)]
    stream = bytearray(b"\x7e" * (2 * SUB_LEN))  # pre-CCC warm-up fill
    fast_f = [0]
    end = aas_target(n_frames - 4)
    while len(stream) < end:
        if specials and len(stream) >= aas_target(specials[0][0]):
            _, tag, lot, r = specials.pop(0)
            stream += lot_aas(tag, lot, r)
        elif specials and aas_target(specials[0][0]) - len(stream) < 340:
            stream += b"\x7e" * 16  # idle fill up to the special slot
        else:
            f = fast_f[0]
            stream += lot_aas(f"fast{f // 3}", 100 + f // 3, f % 3)
            fast_f[0] += 1
    n_blocks_aas = -(-len(stream) // 255)
    block_stream = b"".join(
        BBM_MAGIC + bytes(stream[i * 255:(i + 1) * 255]).ljust(
            255, b"\x7e") for i in range(n_blocks_aas))
    # the CCC repeats EVERY frame (broadcast, like the reference): the
    # sync-width latch consumes the first frames, and every relock must
    # be able to re-learn the configuration
    ccc_chunk = ccc_config().ljust(SYNC_WIDTH, b"\x7e")

    def fixed_tail(g: int) -> bytes:
        sub = block_stream[g * SUB_LEN:(g + 1) * SUB_LEN] \
            .ljust(SUB_LEN, b"\x7e")
        return sub + ccc_chunk + bytes([SYNC_BYTE])

    from nrsc5_tpu.tx.transport_encoder import build_audio_pdu, pack_frame
    tail_len = SUB_LEN + SYNC_WIDTH + 1

    def frame_psd(g: int) -> bytes:
        if g % 16 == 1:  # periodic SIG so relocked segments re-learn it
            return aas_frame(0x20, (g // 16) & 0xFFFF, sig_table())
        return b""

    def frame_mats():
        g = 0
        for chunk in range(n_frames // 4):
            mats = []
            for _ in range(4):
                pkts = [hdc_pkts[(g * per_frame + k) % len(hdc_pkts)]
                        for k in range(per_frame)]
                pdu = build_audio_pdu(
                    pkts, program=0, pdu_seq=g % 8,
                    seq=(g * per_frame) % 64, psd=frame_psd(g),
                    total_len=C.MAX_PDU_LEN - tail_len)
                buf = pdu.tobytes() + fixed_tail(g)
                p1 = pack_frame(np.frombuffer(buf, np.uint8),
                                C.P1_FRAME_LEN_FM, C.PCI_AUDIO_FIXED)
                mats.append(build_pm_matrix(
                    p1, np.zeros((16, 80), np.uint8)))
                g += 1
            sig = modulate_fm(np.concatenate(mats),
                              np.tile(np.arange(16), 4), 1)
            if chunk == 0:
                sig = np.concatenate(
                    [np.zeros(C.FFTCP_FM // 2, np.complex64), sig])
            if g % hole_every == 0 and g < n_frames:
                # deliberate hole: drop a non-multiple-of-frame tail —
                # a timing jump the FINE-only serving chain cannot ride
                sig = sig[:len(sig) - 500_000 - 33_333]
            yield sig

    def rss_mb() -> float:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    events = []
    fleet = FleetAudioDecoder(1, lambda st, ev: events.append(ev), k=8)
    rx = MultiStationReceiver(1, fleet.wrap, frames_per_dispatch=2,
                              hdc_factory=None, cold_start=True)

    max_station_q = max_fleet_q = 0
    rss_warm = None
    blocks = 0
    for block in _drift_chunks(frame_mats(), ppm=100.0, cfo_hz=150.0,
                               snr_db=30.0, rng=rng):
        for lo in range(0, len(block), 300000):
            rx.push(0, block[lo:lo + 300000])
            max_station_q = max(max_station_q, rx._sizes[0])
            max_fleet_q = max(max_fleet_q,
                              max(len(q) for q in fleet._queues))
        blocks += 1
        if blocks == 24 and rss_warm is None:  # ~96 frames in: warm
            rss_warm = rss_mb()
    rx.flush()
    fleet.flush()
    rss_end = rss_mb()

    # three holes -> exactly three watchdog relocks, four SYNCs total
    kinds = [e.type for e in events]
    assert kinds.count(EventType.LOST_SYNC) == 3, \
        kinds.count(EventType.LOST_SYNC)
    assert kinds.count(EventType.SYNC) == 4, kinds.count(EventType.SYNC)

    # zero post-warm-up loss WITHIN each lock segment: count clean HDC
    # between each SYNC and the next LOST_SYNC
    seg_counts, cur, in_lock = [], 0, False
    for e in events:
        if e.type == EventType.SYNC:
            cur, in_lock = 0, True
        elif e.type == EventType.LOST_SYNC:
            seg_counts.append(cur)
            in_lock = False
        elif in_lock and e.type == EventType.HDC and not e.crc_error:
            cur += 1
    seg_counts.append(cur)
    assert len(seg_counts) == 4
    # each segment spans ~128 frames; allow ~8 frames of hole spill +
    # relock + pipeline warm-up at the edges
    for si, cnt in enumerate(seg_counts):
        assert cnt >= (hole_every - 8) * per_frame, (si, cnt)
    hdc = [e for e in events if e.type == EventType.HDC
           and not e.crc_error]
    assert {e.data for e in hdc} <= pool, "corrupted packet emitted"

    # LOT: sustained bit-exact completions, control completes, victim
    # EVICTED by the 12-file LRU churn between its fragments
    lots = [e for e in events if e.type == EventType.LOT]
    names = {e.name for e in lots}
    fast_done = [e for e in lots if e.name.startswith("fast")]
    assert len(fast_done) >= 15, len(fast_done)
    for e in lots:
        assert bytes(e.data) == _lot_content(e.name[:-4]), e.name
    assert "ctl.png" in names, "control file did not complete"
    assert "vic.png" not in names, \
        "victim completed: the 12-file LOT LRU did not evict"

    # bounded queues + bounded memory over ~13 minutes of signal
    dispatch_window = rx._needed + rx._overlap
    assert max_station_q < 4 * dispatch_window, \
        (max_station_q, dispatch_window)
    assert max_fleet_q <= 64 + 8, max_fleet_q
    assert rss_end < rss_warm + 400, (rss_warm, rss_end)

    # audio: continuous non-silent PCM (segment edges excluded)
    audio = [e for e in events if e.type == EventType.AUDIO]
    assert len(audio) >= len(hdc) - 128, (len(audio), len(hdc))
    pcm = np.concatenate([np.asarray(e.samples) for e in audio])
    assert np.abs(pcm).max() > 1000, "silent soak audio"
