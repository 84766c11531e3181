"""System-level session test — the framework's analog of the reference CI
golden path (decode a capture, observe the ID3 title; see
.github/workflows/ci.yml:30-42): HDC packets + ID3 PSD + SIS → transport
encode → OFDM modulate → impaired channel → NRSC5 session → events."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import EventType
from nrsc5_tpu.api.session import MODE_FM, NRSC5
from nrsc5_tpu.tx import channel as ch
from nrsc5_tpu.tx.encoder import build_pm_matrix
from nrsc5_tpu.tx.modulator import modulate_fm
from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

TITLE = "You're Listening to TPU"


def _id3(title: str) -> bytes:
    frame = b"TIT2" + (len(title) + 1).to_bytes(4, "big") + b"\x00\x00" \
        + b"\x00" + title.encode("latin-1")
    size = len(frame)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + ss + frame


def _sis_station_name_frame() -> np.ndarray:
    """An 80-bit PIDS frame carrying the short station name 'KTPU-FM'."""
    from nrsc5_tpu.transport.pids import CHAR5, PIDS_TYPE_SIS
    from nrsc5_tpu.utils.crc import crc12
    bits = np.zeros(80, np.uint8)
    pos = 0

    def put(value, n):
        nonlocal pos
        for i in range(n - 1, -1, -1):
            bits[pos] = (value >> i) & 1
            pos += 1

    put(PIDS_TYPE_SIS, 1)
    put(0, 1)  # one payload
    put(1, 4)  # msg id: short name
    for chs in "KTPU":
        put(CHAR5.index(chs), 5)
    put(0b01, 2)  # -FM
    crc = crc12(bits)
    put_pos = 68
    for i in range(12):
        bits[put_pos + i] = (crc >> (11 - i)) & 1
    return bits.reshape(10, 8)[:, ::-1].reshape(-1)


def test_fm_session_golden_path(rng):
    n_frames = 3
    all_packets = []
    p1_frames = []
    for f in range(n_frames):
        packets = [rng.integers(0, 256, rng.integers(200, 400)).astype(np.uint8)
                   .tobytes() for _ in range(32)]
        all_packets.append(packets)
        psd = aas_frame(0x5100, f, _id3(TITLE))
        p1_frames.append(build_p1_fm_frame(
            packets, program=0, pdu_seq=f % 8, seq=(f * 32) % 64, psd=psd))

    sis = _sis_station_name_frame()
    pids = np.broadcast_to(sis, (16, 80))

    mats = [build_pm_matrix(p1_frames[f], pids) for f in range(n_frames)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    sig = ch.impair(sig, sample_offset=4321, cfo_hz=150.0, snr_db=23.0,
                    rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])

    kinds = {e.type for e in events}
    assert EventType.SYNC in kinds
    # ID3 title decoded (the CI assertion)
    titles = [e.title for e in events if e.type == EventType.ID3]
    assert TITLE in titles, f"ID3 titles: {titles}"
    # SIS station name decoded
    names = [e.name for e in events if e.type == EventType.STATION_NAME]
    assert "KTPU-FM" in names
    # HDC packets bit-exact: every frame-0 and frame-1 packet must appear
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    want = {p for f in (0, 1) for p in all_packets[f]}
    missing = want - hdc
    assert not missing, f"{len(missing)} HDC packets missing of {len(want)}"
    # audio service info observed
    assert EventType.AUDIO_SERVICE in kinds


@pytest.mark.parametrize("ma3", [False, True])
def test_am_session_transport(rng, ma3):
    """AM mode through the session API: MA1/MA3 L1 + 466-byte audio PDUs →
    bit-exact HDC packet events (BASELINE config 2 analog).  MA3 exercises
    the control-driven service-mode switch (psmi from the reference
    subcarrier, reference: src/sync.c:649-666) end to end."""
    from nrsc5_tpu.api.session import MODE_AM

    from .capture_helpers import build_am_capture

    sig, packets = build_am_capture(rng, n_frames=7, ma3=ma3)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_AM)
    for i in range(0, len(sig), 32768):
        radio.pipe_samples_cs16(sig[i:i + 32768])
    radio.flush()

    kinds = {e.type for e in events}
    assert EventType.SYNC in kinds
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    # frames 4 and 5 decode (diversity warm-up covers 0-3, matching the
    # reference's acquisition latency); their packets must appear
    want = {p for f, pk in packets if f in (4, 5) for p in pk}
    got = sum(p in hdc for p in want)
    assert got == len(want), f"{got}/{len(want)} AM HDC packets"


@pytest.mark.parametrize("turbo", [False, True])
def test_sync_loss_and_recovery(rng, turbo):
    """Signal -> noise gap -> signal: the RS-failure resync rule fires
    (LOST_SYNC) and the receiver re-acquires and decodes again
    (reference: src/frame.c:535-540 + input.c state machine)."""
    def capture(seed, trail_frames=0):
        r = np.random.default_rng(seed)
        packets = [r.integers(0, 256, 300).astype(np.uint8).tobytes()
                   for _ in range(32)]
        n = 2 + trail_frames  # trail frames carry junk, keep the clock going
        frames = [build_p1_fm_frame(packets, 0, f % 8, (f * 32) % 64)
                  for f in range(2)]
        pids = np.zeros((16, 80), np.uint8)
        mats = [build_pm_matrix(fr, pids) for fr in frames]
        for _ in range(trail_frames):
            mats.append(build_pm_matrix(
                r.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids))
        dummy = build_pm_matrix(
            r.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
        matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:2 * 32]])
        bc = np.concatenate([np.arange(14, 16), np.tile(np.arange(16), n),
                             np.arange(2)])
        return modulate_fm(matrix, bc, 1), packets

    sig1, pk1 = capture(1)
    sig2, pk2 = capture(2, trail_frames=2)
    noise = (np.random.default_rng(3).normal(0, 0.1, (400000, 2))
             .astype(np.float32).view(np.complex64)[:, 0])
    stream = np.concatenate([sig1, noise, sig2])

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM, turbo=turbo)
    for i in range(0, len(stream), 65536):
        radio.pipe_samples_cs16(stream[i:i + 65536])

    kinds = [e.type for e in events]
    assert kinds.count(EventType.SYNC) >= 2, "no re-acquisition"
    assert EventType.LOST_SYNC in kinds
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    assert pk1[0] in hdc, "first segment audio missing"
    assert pk2[0] in hdc, "post-recovery audio missing"


def test_fm_session_turbo_path(rng):
    """The turbo (fused steady-state) receiver produces the same transport
    output through the session API as the per-block path."""
    n_frames = 4
    all_packets, p1_frames = [], []
    for f in range(n_frames):
        packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                   for _ in range(32)]
        all_packets.append(packets)
        psd = aas_frame(0x5100, f, _id3(TITLE))
        p1_frames.append(build_p1_fm_frame(
            packets, 0, f % 8, (f * 32) % 64, psd=psd))
    sis = _sis_station_name_frame()
    pids = np.broadcast_to(sis, (16, 80))
    mats = [build_pm_matrix(fr, pids) for fr in p1_frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    sig = ch.impair(sig, sample_offset=2000, snr_db=25.0, rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM, turbo=True)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])

    titles = [e.title for e in events if e.type == EventType.ID3]
    assert TITLE in titles
    names = [e.name for e in events if e.type == EventType.STATION_NAME]
    assert "KTPU-FM" in names
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    want = {p for f in range(2) for p in all_packets[f]}
    missing = want - hdc
    assert not missing, f"{len(missing)} HDC packets missing (turbo)"


def test_fm_session_p3_audio(rng):
    """MP3 service mode end to end at the session boundary: a second audio
    program (SPS) carried in P3 audio PDUs through the interleaver-IV
    channel must surface as program-1 AUDIO_SERVICE + bit-exact HDC events
    (reference: the P3 path of src/frame.c:645-714 + src/output.c)."""
    from .capture_helpers import build_fm_mp3_capture

    sig, p3_packets = build_fm_mp3_capture(rng, n_cycles=2)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])

    svc = {e.program for e in events if e.type == EventType.AUDIO_SERVICE}
    assert 1 in svc, f"program-1 audio service missing (got {svc})"
    hdc1 = [e.data for e in events
            if e.type == EventType.HDC and e.program == 1]
    cyc1 = {p for cyc, pkts in p3_packets if cyc == 1 for p in pkts}
    matches = sum(1 for d in hdc1 if d in cyc1)
    assert matches > 0, \
        f"no bit-exact cycle-1 P3 HDC packet of {len(cyc1)} surfaced"


def test_cs16_bytes_push_and_partial_pairs():
    """pipe_samples_cs16 must accept raw bytes (the worker thread hands
    over unparsed source reads) and carry a trailing partial I/Q pair to
    the next call (reference: src/nrsc5.c:627-650 leftover handling)."""
    radio = NRSC5.open_pipe(lambda ev: None, MODE_FM)
    got = []
    radio.radio.push_cs16 = lambda arr: got.append(np.asarray(arr))

    rng = np.random.default_rng(5)
    iq = rng.integers(-3000, 3000, 4 * 100, dtype=np.int16)
    raw = iq.tobytes()
    # feed in deliberately misaligned chunks (not multiples of 4 bytes)
    for lo, hi in ((0, 7), (7, 130), (130, 133), (133, len(raw))):
        radio.pipe_samples_cs16(raw[lo:hi])
    stream = np.concatenate(got)

    radio2 = NRSC5.open_pipe(lambda ev: None, MODE_FM)
    got2 = []
    radio2.radio.push_cs16 = lambda arr: got2.append(np.asarray(arr))
    radio2.pipe_samples_cs16(iq)
    assert np.array_equal(stream, np.concatenate(got2))


def test_cs16_file_worker(tmp_path):
    """open_file(input_format='cs16') + start(): the worker thread must
    survive raw byte reads (odd tails included) and emit LOST_DEVICE at
    EOF instead of dying silently (ADVICE round 1, medium)."""
    rng = np.random.default_rng(6)
    path = tmp_path / "capture.cs16"
    # 3 reads of 32768 bytes plus a ragged 2-byte tail
    path.write_bytes(rng.integers(-100, 100, 3 * 16384 + 1,
                                  dtype=np.int16).tobytes())

    events = []
    radio = NRSC5.open_file(str(path), events.append, MODE_FM,
                            input_format="cs16")
    pushed = []
    radio.radio.push_cs16 = lambda arr: pushed.append(np.asarray(arr))
    radio.start()
    radio._worker.join(timeout=30)
    assert not radio._worker.is_alive(), "worker thread hung"
    radio.close()
    assert any(e.type == EventType.LOST_DEVICE for e in events), \
        "no LOST_DEVICE at EOF (worker died early?)"
    assert sum(len(p) for p in pushed) == (3 * 16384 + 1) // 2


def test_fm_session_real_audio(rng):
    """End-to-end *audio*: HDC packets produced by the truth-harness
    encoder ride the full chain (transport encode → OFDM → channel →
    session) and come back as AUDIO events whose PCM matches the source
    program audio (reference capability: src/output.c:126-163 decode via
    patched FAAD2; here the built-in codec, selected automatically)."""
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder

    n_frames = 3
    sr = C.SAMPLE_RATE_AUDIO
    n = n_frames * 32 * C.AUDIO_FRAME_SAMPLES
    t = np.arange(n) / sr
    land = 0.3 * np.sin(2 * np.pi * 440 * t) \
        + 0.15 * np.sin(2 * np.pi * 1320 * t + 0.5) \
        + 0.1 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 3 * t)
    pcm = np.stack([land, 0.8 * land], axis=-1)

    enc = HDCEncoder(2)
    hdc_packets = [enc.encode_frame(
        pcm[i * C.AUDIO_FRAME_SAMPLES * 1:(i + 1) * C.AUDIO_FRAME_SAMPLES])
        for i in range(n_frames * 32)]

    p1_frames = [build_p1_fm_frame(hdc_packets[f * 32:(f + 1) * 32],
                                   program=0, pdu_seq=f % 8,
                                   seq=(f * 32) % 64)
                 for f in range(n_frames)]
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(fr, pids) for fr in p1_frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    sig = ch.impair(sig, sample_offset=777, cfo_hz=80.0, snr_db=25.0,
                    rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])
    radio.flush()

    audio = [e.samples for e in events
             if e.type == EventType.AUDIO and e.program == 0]
    assert len(audio) >= 48, f"only {len(audio)} AUDIO events"
    got = np.concatenate(audio).reshape(-1, 2).astype(np.float64) / 32768.0

    # align against the source (codec latency + whole dropped lead
    # packets) and require decent fidelity over a mid-stream window
    x = pcm[:, 0]
    y = got[:, 0]
    start = 8 * C.AUDIO_FRAME_SAMPLES
    best = (0, -1.0)
    for lag in range(0, 16 * C.AUDIO_FRAME_SAMPLES, 1):
        r = x[start - lag:start - lag + 4096]
        if len(r) < 4096 or start - lag < 0:
            continue
        seg = y[start:start + 4096]
        c = np.dot(seg, r) / (np.linalg.norm(seg) * np.linalg.norm(r)
                              + 1e-12)
        if c > best[1]:
            best = (lag, c)
    lag, corr = best
    seg = y[start:start + 16384]
    r = x[start - lag:start - lag + 16384]
    err = seg - r
    snr = 10 * np.log10(np.dot(r, r) / max(np.dot(err, err), 1e-12))
    assert snr > 25.0, f"audio SNR {snr:.1f} dB (lag {lag}, corr {corr:.3f})"


def test_set_mode_switch_and_version(rng):
    """nrsc5_set_mode analog: an FM session switched to AM must rewire the
    chain and decode an AM capture (reference: src/nrsc5.c:464-473)."""
    from nrsc5_tpu.api.session import MODE_AM

    from .capture_helpers import build_am_capture

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    radio.set_mode(MODE_AM)
    sig, packets = build_am_capture(rng, n_frames=7, ma3=False)
    for i in range(0, len(sig), 32768):
        radio.pipe_samples_cs16(sig[i:i + 32768])
    radio.flush()
    kinds = {e.type for e in events}
    assert EventType.SYNC in kinds
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    want = {p for f, pk in packets if f == 5 for p in pk}
    assert want <= hdc

    # set_callback swaps the sink (reference: nrsc5_set_callback)
    late = []
    radio.set_callback(late.append)
    radio.flush()
    assert NRSC5.get_version()
    assert radio.get_frequency() != radio.get_frequency()  # NaN: no tuner


def test_set_mode_reentrant_from_callback(rng):
    """Calling set_mode/set_callback from inside the event callback must
    not deadlock (events are emitted under the session lock; the
    reference allows nrsc5_set_callback at any time, src/nrsc5.c:585)."""
    from .capture_helpers import build_am_capture

    done = []

    def cb(ev):
        if ev.type == EventType.SYNC and not done:
            done.append(True)
            radio.set_callback(lambda e: None)

    from nrsc5_tpu.api.session import MODE_AM
    radio = NRSC5.open_pipe(cb, MODE_AM)
    sig, _ = build_am_capture(rng, n_frames=5, ma3=False)
    for i in range(0, len(sig), 32768):
        radio.pipe_samples_cs16(sig[i:i + 32768])
    assert done, "never synced"


def test_fm_session_two_audio_programs(rng):
    """Two audio programs (MPS + an SPS) multiplexed as two PDUs in one
    P1 frame — the reference's multi-program path (HEF program numbers,
    per-program elastic buffers and codecs; src/frame.c:198-265,602-609,
    src/output.c:100-168): both programs must deliver bit-exact HDC
    packets, audio-service events, and distinct real PCM."""
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder
    from nrsc5_tpu.tx.transport_encoder import build_audio_pdu, pack_frame

    n_frames = 3
    sr = C.SAMPLE_RATE_AUDIO
    n = n_frames * 32 * C.AUDIO_FRAME_SAMPLES
    t = np.arange(n) / sr
    tones = (440.0, 660.0)
    pcms = [0.3 * np.sin(2 * np.pi * f0 * t) for f0 in tones]
    pk = []
    for x in pcms:
        enc = HDCEncoder(2)
        stereo = np.stack([x, x], axis=-1)
        pk.append([enc.encode_frame(
            stereo[i * C.AUDIO_FRAME_SAMPLES:(i + 1) * C.AUDIO_FRAME_SAMPLES])
            for i in range(n_frames * 32)])

    frames = []
    for f in range(n_frames):
        pdus = [build_audio_pdu(pk[p][f * 32:(f + 1) * 32], program=p,
                                pdu_seq=f % 8, seq=(f * 32) % 64)
                for p in (0, 1)]
        both = np.concatenate(pdus)
        assert len(both) <= C.MAX_PDU_LEN, len(both)
        both = np.concatenate(
            [both, np.zeros(C.MAX_PDU_LEN - len(both), np.uint8)])
        frames.append(pack_frame(both, C.P1_FRAME_LEN_FM, C.PCI_AUDIO))

    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(fr, pids) for fr in frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    sig = ch.impair(sig, sample_offset=555, snr_db=25.0, rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])
    radio.flush()

    # both programs announced
    svc = {e.program for e in events if e.type == EventType.AUDIO_SERVICE}
    assert {0, 1} <= svc, f"audio services announced: {svc}"

    # bit-exact HDC packets per program, no cross-program leakage
    for p in (0, 1):
        want = {bytes(q) for q in pk[p]}
        other = {bytes(q) for q in pk[1 - p]}
        got = [e.data for e in events
               if e.type == EventType.HDC and e.program == p
               and not e.crc_error]
        assert len(got) >= 48, f"program {p}: only {len(got)} HDC events"
        assert all(g in want for g in got), f"program {p}: foreign packets"
        assert not any(g in other for g in got if g not in want)

    # real, distinct PCM per program (dominant tone check)
    for p, f0 in enumerate(tones):
        audio = [e.samples for e in events
                 if e.type == EventType.AUDIO and e.program == p]
        assert len(audio) >= 40, f"program {p}: {len(audio)} AUDIO events"
        y = np.concatenate(audio).reshape(-1, 2)[:, 0].astype(np.float64)
        seg = y[16384:16384 + 16384]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_hz = np.fft.rfftfreq(len(seg), 1 / sr)[int(np.argmax(spec))]
        assert abs(peak_hz - f0) < 20, \
            f"program {p}: dominant {peak_hz:.0f} Hz, want {f0}"


def test_fm_session_device_backend(rng):
    """The session surface routed through the accelerator serving chain
    (device=True -> serve.MultiStationReceiver n=1, VERDICT r2 item 8):
    cold start from unknown offset/CFO, then the same golden-path
    assertions as the host-receiver session; CPU fallback untouched."""
    n_frames = 3
    all_packets = []
    p1_frames = []
    for f in range(n_frames):
        packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                   for _ in range(32)]
        all_packets.append(packets)
        psd = aas_frame(0x5100, f, _id3(TITLE))
        p1_frames.append(build_p1_fm_frame(
            packets, program=0, pdu_seq=f % 8, seq=(f * 32) % 64, psd=psd))
    sis = _sis_station_name_frame()
    pids = np.broadcast_to(sis, (16, 80))
    mats = [build_pm_matrix(p1_frames[f], pids) for f in range(n_frames)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    sig = ch.impair(sig, sample_offset=4321, cfo_hz=150.0, snr_db=23.0,
                    rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM, device=True)
    from nrsc5_tpu.pipeline.device_receiver import DeviceReceiver
    assert isinstance(radio.radio, DeviceReceiver)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])
    radio.flush()

    kinds = {e.type for e in events}
    assert EventType.SYNC in kinds
    titles = [e.title for e in events if e.type == EventType.ID3]
    assert TITLE in titles, f"ID3 titles: {titles}"
    names = [e.name for e in events if e.type == EventType.STATION_NAME]
    assert "KTPU-FM" in names
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    want = {p for f in (0, 1) for p in all_packets[f]}
    missing = want - hdc
    assert not missing, f"{len(missing)} HDC packets missing of {len(want)}"
    assert EventType.AUDIO_SERVICE in kinds


def test_am_session_device_backend(rng):
    """AM twin: device-backed session cold-starts MA1 from a cs16-style
    complex stream and decodes bit-exact HDC packets post warm-up."""
    from .capture_helpers import build_am_capture

    from nrsc5_tpu.api.session import MODE_AM
    sig, packets = build_am_capture(rng, n_frames=8)
    events = []
    radio = NRSC5.open_pipe(events.append, MODE_AM, device=True)
    for i in range(0, len(sig), 50000):
        radio.pipe_samples_cs16(sig[i:i + 50000])
    radio.flush()
    kinds = {e.type for e in events}
    assert EventType.SYNC in kinds
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    want = {bytes(p) for f, pk in packets for p in pk}
    assert len(hdc & want) >= 48, len(hdc & want)


def test_device_receiver_odd_cu8(rng):
    """push_cu8 must carry partial I/Q pair bytes across pushes: odd
    chunk splits land mid-pair and must not crash or desync (regression:
    the first DeviceReceiver dropped serve.push's _leftover carry)."""
    from nrsc5_tpu.pipeline.device_receiver import DeviceReceiver

    data = rng.integers(0, 256, 100001).astype(np.uint8)  # odd total
    r1 = DeviceReceiver(lambda ev: None)
    r1.push_cu8(data[:100000])  # one even-length push
    even = np.concatenate(r1._buf)
    r2 = DeviceReceiver(lambda ev: None)
    for lo in range(0, len(data), 33333):  # odd chunks split mid-pair
        r2.push_cu8(data[lo:lo + 33333])
    odd = np.concatenate(r2._buf)
    assert len(odd) >= len(even)
    np.testing.assert_array_equal(odd[:len(even)], even)


def test_fm_session_turbo_mp5(rng):
    """MP5 (cm 5) through the session turbo path: the fused steady-state
    receiver promotes on cm 5/6 and decodes PM, with the extended band
    carried but undecoded (reference treatment: src/sync.c:343-357)."""
    n_frames = 4
    all_packets, p1_frames = [], []
    for f in range(n_frames):
        packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                   for _ in range(32)]
        all_packets.append(packets)
        psd = aas_frame(0x5100, f, _id3(TITLE))
        p1_frames.append(build_p1_fm_frame(
            packets, 0, f % 8, (f * 32) % 64, psd=psd))
    sis = _sis_station_name_frame()
    pids = np.broadcast_to(sis, (16, 80))
    mats = [build_pm_matrix(fr, pids) for fr in p1_frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    psmi = 5
    n_ext = C.partitions_per_band(psmi) - C.PM_PARTITIONS
    ext = rng.choice(np.array([-1, 1], np.int8),
                     (len(matrix), 2 * n_ext * C.PARTITION_DATA_CARRIERS * 2))
    sig = modulate_fm(matrix, bc_seq, psmi, ext_signs=ext)
    sig = ch.impair(sig, sample_offset=2000, snr_db=25.0, rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM, turbo=True)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])

    syncs = {e.psmi for e in events if e.type == EventType.SYNC}
    assert psmi in syncs
    titles = [e.title for e in events if e.type == EventType.ID3]
    assert TITLE in titles
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    want = {p for f in range(2) for p in all_packets[f]}
    missing = want - hdc
    assert not missing, f"{len(missing)} HDC packets missing (turbo MP5)"


def test_fm_session_four_programs_sis_aas(rng):
    """The BASELINE.json "all-programs" config from ONE capture: four
    audio programs (0-3) multiplexed as four PDUs per P1 frame
    (reference MAX_PROGRAMS path, src/frame.c:198-265 +
    src/output.c:100-168), SIS on the PIDS subcarriers, ID3 PSD on the
    main program, and an AAS LOT file — every service class decodes
    through one session: four bit-exact HDC streams with no
    cross-program leakage, four distinct PCM tones, station name,
    title, and the reassembled LOT file."""
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder
    from nrsc5_tpu.tx.transport_encoder import build_audio_pdu, pack_frame

    from .test_transport import lot_fragment, sig_table

    n_frames = 4
    per = 8  # packets per program per frame (4 PDUs share the frame)
    sr = C.SAMPLE_RATE_AUDIO
    n = n_frames * per * C.AUDIO_FRAME_SAMPLES
    t = np.arange(n) / sr
    tones = (440.0, 660.0, 880.0, 1320.0)
    pk = []
    for f0 in tones:
        enc = HDCEncoder(2)
        x = 0.3 * np.sin(2 * np.pi * f0 * t)
        stereo = np.stack([x, x], axis=-1)
        pk.append([enc.encode_frame(
            stereo[i * C.AUDIO_FRAME_SAMPLES:(i + 1)
                   * C.AUDIO_FRAME_SAMPLES])
            for i in range(n_frames * per)])

    lot_content = ((np.arange(100) * 7) % 256).astype(np.uint8).tobytes()
    frames = []
    for f in range(n_frames):
        pdus = []
        for p in range(4):
            # the PSD slot is per PDU (~176 B): ID3 rides program 0,
            # the AAS control/data frames ride program 1's slot
            psd = b""
            if p == 0:
                psd = aas_frame(0x5100, 2 * f, _id3(TITLE))
            elif p == 1 and f == 0:
                psd = aas_frame(0x20, 1, sig_table())
            elif p == 1 and f == 1:
                psd = aas_frame(0x1001, 2, lot_fragment(
                    42, 0, lot_content, name="four.png",
                    size=len(lot_content)))
            pdus.append(build_audio_pdu(
                pk[p][f * per:(f + 1) * per], program=p,
                pdu_seq=f % 8, seq=(f * per) % 64, psd=psd))
        both = np.concatenate(pdus)
        assert len(both) <= C.MAX_PDU_LEN, len(both)
        both = np.concatenate(
            [both, np.zeros(C.MAX_PDU_LEN - len(both), np.uint8)])
        frames.append(pack_frame(both, C.P1_FRAME_LEN_FM, C.PCI_AUDIO))

    sis = _sis_station_name_frame()
    pids = np.broadcast_to(sis, (16, 80))
    mats = [build_pm_matrix(fr, pids) for fr in frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    sig = ch.impair(sig, sample_offset=777, snr_db=25.0, rng=rng)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    for i in range(0, len(sig), 65536):
        radio.pipe_samples_cs16(sig[i:i + 65536])
    radio.flush()

    svc = {e.program for e in events if e.type == EventType.AUDIO_SERVICE}
    assert {0, 1, 2, 3} <= svc, f"audio services announced: {svc}"

    allpk = [{bytes(q) for q in pk[p]} for p in range(4)]
    for p in range(4):
        got = [e.data for e in events
               if e.type == EventType.HDC and e.program == p
               and not e.crc_error]
        assert len(got) >= 2 * per, f"program {p}: {len(got)} HDC events"
        assert all(g in allpk[p] for g in got), \
            f"program {p}: foreign packets"
        for q in range(4):
            if q != p:
                assert not any(g in allpk[q] - allpk[p] for g in got)

    # four distinct PCM tones
    for p, f0 in enumerate(tones):
        audio = [e.samples for e in events
                 if e.type == EventType.AUDIO and e.program == p]
        assert len(audio) >= per, f"program {p}: {len(audio)} AUDIO"
        y = np.concatenate(audio).reshape(-1, 2)[:, 0].astype(np.float64)
        seg = y[4096:4096 + 16384]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_hz = np.fft.rfftfreq(len(seg), 1 / sr)[int(np.argmax(spec))]
        assert abs(peak_hz - f0) < 20, \
            f"program {p}: dominant {peak_hz:.0f} Hz, want {f0}"

    # SIS, ID3, and the AAS LOT file from the same capture
    names = {e.name for e in events if e.type == EventType.STATION_NAME}
    assert "KTPU-FM" in names, names
    assert TITLE in {e.title for e in events if e.type == EventType.ID3}
    lots = [e for e in events if e.type == EventType.LOT]
    assert lots and lots[0].name == "four.png"
    assert bytes(lots[0].data) == lot_content
