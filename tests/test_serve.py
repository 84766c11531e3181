"""Multi-station serving API: per-station streams in, per-station
transport events out, one batched device dispatch for all stations
(nrsc5_tpu/serve.py — the serving surface the e2e benchmark measures)."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import EventType
from nrsc5_tpu.tx.encoder import build_pm_matrix
from nrsc5_tpu.tx.modulator import modulate_fm
from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame


def _id3(title: str) -> bytes:
    fr = b"TIT2" + (len(title) + 1).to_bytes(4, "big") + b"\x00\x00" \
        + b"\x00" + title.encode("latin-1")
    size = len(fr)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + ss + fr


def _station_mats(rng, title, n_frames=3):
    """PM matrices + HDC packets for n_frames steady-state P1 frames."""
    packets = [rng.integers(0, 256, 280).astype(np.uint8).tobytes()
               for _ in range(n_frames * 32)]
    psd = aas_frame(0x5100, 0, _id3(title))
    mats = [build_pm_matrix(
        build_p1_fm_frame(packets[f * 32:(f + 1) * 32], 0, f % 8,
                          (f * 32) % 64, psd=psd),
        np.zeros((16, 80), np.uint8)) for f in range(n_frames)]
    return mats, packets


def _station_stream(rng, title, n_frames=3):
    """Steady-state rc stream (frame-aligned, bc 0) + its HDC packets."""
    mats, packets = _station_mats(rng, title, n_frames)
    sig = modulate_fm(np.concatenate(mats),
                      np.tile(np.arange(16), n_frames), 1)
    buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
    buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig
    return buf, packets


def test_multistation_serving(rng):
    from nrsc5_tpu.serve import MultiStationReceiver

    titles = ["Station Zero Song", "Station One Song"]
    streams, want = [], []
    for t in titles:
        sig, packets = _station_stream(rng, t)
        streams.append(sig)
        want.append({bytes(p) for p in packets})

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1)
    # interleaved, odd-sized pushes (streaming, not one-shot)
    pos = [0, 0]
    chunk = 48 * 1024 + 17
    while any(pos[i] < len(streams[i]) for i in range(2)):
        for i in range(2):
            rx.push(i, streams[i][pos[i]:pos[i] + chunk])
            pos[i] += chunk
    rx.flush()

    for i, t in enumerate(titles):
        got_titles = {e.title for e in events[i]
                      if e.type == EventType.ID3}
        assert t in got_titles, (i, got_titles)
        # no cross-station leakage
        assert titles[1 - i] not in got_titles
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want[i]) >= 64, (i, len(hdc & want[i]))
        assert not (hdc & want[1 - i] - want[i])
        assert any(e.type == EventType.AUDIO_SERVICE for e in events[i])


def test_multistation_px_channels(rng):
    """MP3 service mode through the serving API: the SPS (program-1 audio
    in P3 PDUs over the PX1 interleaver-IV channel) reaches the
    per-station transport after the interleaver warm-up cycle."""
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx.encoder import build_px_stream
    from nrsc5_tpu.tx.transport_encoder import (build_audio_pdu,
                                                pack_frame)

    psmi, n_cycles = 3, 3
    fl = C.P3_FRAME_LEN_MP3_MP11
    p3_bytes = (fl - 24) // 8
    sps_packets = []
    p3_bits = np.zeros((n_cycles, 16, fl), np.uint8)
    for cyc in range(n_cycles):
        for f in range(16):
            pkts = [rng.integers(0, 256, 150).astype(np.uint8).tobytes()
                    for _ in range(3)]
            sps_packets.extend(pkts)
            g = cyc * 16 + f
            pdu = build_audio_pdu(pkts, program=1, pdu_seq=g % 8,
                                  seq=(g * 3) % 64, total_len=p3_bytes)
            p3_bits[cyc, f] = pack_frame(pdu, fl, C.PCI_AUDIO)
    px = build_px_stream(p3_bits, fl).reshape(n_cycles * 32 * C.BLKSZ, -1)

    mats = []
    for f in range(n_cycles * 2):
        pkts = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                for _ in range(32)]
        mats.append(build_pm_matrix(
            build_p1_fm_frame(pkts, 0, f % 8, (f * 32) % 64),
            np.zeros((16, 80), np.uint8)))
    sig = modulate_fm(np.concatenate(mats),
                      np.tile(np.arange(16), n_cycles * 2), psmi,
                      px1_signs=px)
    buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
    buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=2, psmi=psmi)
    rx.push(0, buf)
    rx.flush()

    want = {bytes(p) for p in sps_packets}
    got = {e.data for e in events
           if e.type == EventType.HDC and e.program == 1
           and not e.crc_error}
    assert len(got & want) >= 32, len(got & want)
    assert any(e.type == EventType.AUDIO_SERVICE and e.program == 1
               for e in events)


def test_multistation_cs16_input(rng):
    """cs16 input format: raw interleaved int16 I/Q in, on-device float
    conversion — same decode as the cf32 path (quantization is ~90 dB
    below signal; packets stay bit-exact)."""
    from nrsc5_tpu.serve import MultiStationReceiver

    sig, packets = _station_stream(rng, "CS16 Title")
    want = {bytes(p) for p in packets}
    iq = np.empty(2 * len(sig), np.int16)
    # raw wire I/Q (unconjugated; push() applies the ingest convention)
    iq[0::2] = np.clip(sig.real * 32767, -32768, 32767).astype(np.int16)
    iq[1::2] = np.clip(sig.imag * 32767, -32768, 32767).astype(np.int16)

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=1, input_format="cs16")
    for lo in range(0, len(iq), 262144):
        rx.push(0, iq[lo:lo + 262144])
    rx.flush()
    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & want) >= 64, len(hdc & want)
    assert any(e.type == EventType.ID3 and e.title == "CS16 Title"
               for e in events)


def test_multistation_packed_outputs(rng):
    """packed=True (the accelerator default) through both modes on the
    CPU backend: the host-side unpack must invert exactly what each
    chain packed — regression for the AM chain packing p1/p3 but not
    pids (unpack_out then corrupted 80-bit PIDS frames into 640)."""
    from nrsc5_tpu.serve import MultiStationReceiver

    sig, packets = _station_stream(rng, "Packed Title")
    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=1, packed=True)
    rx.push(0, sig)
    rx.flush()
    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & {bytes(p) for p in packets}) >= 64
    assert any(e.type == EventType.ID3 and e.title == "Packed Title"
               for e in events)

    # AM: same stream build as test_multistation_am, packed path
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    n = 7
    am_packets, p1_frames = [], []
    for f in range(n):
        sub = []
        for b in range(8):
            pkts = [rng.integers(0, 256, 100).astype(np.uint8).tobytes()
                    for _ in range(4)]
            am_packets.extend(pkts)
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
    am_sig = modulate_am(mats, pids_codes, ref, False)
    am_buf = np.zeros(len(am_sig) + C.FFTCP_AM, np.complex64)
    am_buf[C.FFTCP_AM // 2:C.FFTCP_AM // 2 + len(am_sig)] = am_sig

    am_events = []
    rx = MultiStationReceiver(1, lambda st, ev: am_events.append(ev),
                              frames_per_dispatch=2, mode="am",
                              packed=True)
    rx.push(0, am_buf)
    rx.flush()
    hdc = {e.data for e in am_events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & {bytes(p) for p in am_packets}) >= 64


def test_multistation_coldstart_locks(rng):
    """The documented cold-start flow end to end: unknown timing +
    integer/fractional CFO -> cold_start_rc lock -> locks= seeds the
    carried CFO state and first_bc drives a one-time alignment dispatch
    -> steady dispatches decode whole frames (regression: first_bc was
    re-applied every dispatch, losing one frame per dispatch, and the
    locked CFO carry could not be injected at all)."""
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import channel as ch

    mats, packets = _station_mats(rng, "Cold Start Title", n_frames=3)
    # prepend a partial frame (2 trailing blocks of a dummy frame) so the
    # lock lands mid-frame: first_bc = 14
    dummy = build_pm_matrix(
        build_p1_fm_frame(
            [rng.integers(0, 256, 280).astype(np.uint8).tobytes()
             for _ in range(32)], 0, 7, 0),
        np.zeros((16, 80), np.uint8))
    matrix = np.concatenate([dummy[14 * 32:]] + mats)
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), 3)])
    full = modulate_fm(matrix, bc_seq, 1)
    capture = np.zeros(len(full) + C.FFTCP_FM, np.complex64)
    capture[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(full)] = full
    bin_hz = C.SAMPLE_RATE_CS16_FM / C.FFT_FM
    capture = ch.impair(capture, sample_offset=1234,
                        cfo_hz=3 * bin_hz + 29.0, snr_db=25.0, rng=rng)

    rcs = np.stack([capture.real, -capture.imag], -1).astype(np.float32)
    lock = rcc.cold_start_rc(rcs)
    assert lock is not None and lock["first_bc"] == 14, lock and {
        k: lock[k] for k in ("offset", "first_bc", "psmi", "cfo")}

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=1, locks=lock)
    tail = np.concatenate(
        [capture[lock["offset"]:], np.zeros(3 * C.FFTCP_FM, np.complex64)])
    for lo in range(0, len(tail), 200000):
        rx.push(0, tail[lo:lo + 200000])
    rx.flush()

    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & {bytes(p) for p in packets}) >= 64, len(hdc)
    assert any(e.type == EventType.ID3 and e.title == "Cold Start Title"
               for e in events)
    # signal-quality observability (parity with the session path)
    bers = [e.cber for e in events if e.type == EventType.BER]
    assert bers and max(bers) < 0.1, bers
    assert any(e.type == EventType.MER and e.lower > 5 for e in events)


def test_multistation_bytes_and_buffer_reuse(rng):
    """push() byte-stream ingestion (odd-sized chunks; partial I/Q pairs
    carry across pushes) and caller-buffer snapshotting (the rc [...,2]
    path must copy — callers stream into one reused read buffer)."""
    from nrsc5_tpu.serve import MultiStationReceiver

    sig, packets = _station_stream(rng, "Bytes Title")
    want = {bytes(p) for p in packets}
    iq = np.empty(2 * len(sig), np.int16)
    iq[0::2] = np.clip(sig.real * 32767, -32768, 32767).astype(np.int16)
    iq[1::2] = np.clip(sig.imag * 32767, -32768, 32767).astype(np.int16)
    wire = iq.tobytes()

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=1, input_format="cs16")
    chunk = 99991  # prime: every split lands mid-pair
    for lo in range(0, len(wire), chunk):
        rx.push(0, wire[lo:lo + chunk])
    rx.flush()
    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & want) >= 64, len(hdc & want)

    # rc-array path with an aggressively reused caller buffer
    rc = np.stack([sig.real, -sig.imag], -1).astype(np.float32)
    events2 = []
    rx = MultiStationReceiver(1, lambda st, ev: events2.append(ev),
                              frames_per_dispatch=1)
    buf = np.empty((150000, 2), np.float32)
    for lo in range(0, len(rc), len(buf)):
        part = rc[lo:lo + len(buf)]
        buf[:len(part)] = part
        rx.push(0, buf[:len(part)])
        buf[:] = -1.0  # clobber: serve must have snapshotted
    rx.flush()
    hdc2 = {e.data for e in events2
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc2 & want) >= 64, len(hdc2 & want)


def test_multistation_cu8_fm(rng):
    """cu8 input format — the reference's native 1.488 MS/s wire
    (nrsc5.h:53, what rtl_tcp delivers): the ÷2 halfband runs on device
    inside the dispatch, with the queue-carried overlap giving zero net
    group delay, so a frame-aligned cu8 stream decodes bit-exact."""
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import channel as ch

    sig, packets = _station_stream(rng, "CU8 Title")
    want = {bytes(p) for p in packets}
    wire = ch.to_cu8(ch.upsample2(sig))  # interleaved uint8, 2x rate

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=1, input_format="cu8")
    chunk = 99991  # odd bytes: splits land mid-pair
    wb = wire.tobytes()
    for lo in range(0, len(wb), chunk):
        rx.push(0, wb[lo:lo + chunk])
    rx.flush()
    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & want) >= 64, len(hdc & want)
    assert any(e.type == EventType.ID3 and e.title == "CU8 Title"
               for e in events)


def test_multistation_cu8_am(rng):
    """AM over cu8: the full ÷32 five-stage cascade on device
    (reference: src/input.c:62-90), fed the 1.488 MS/s wire format."""
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    n = 7
    packets, p1_frames = [], []
    for f in range(n):
        sub = []
        for b in range(8):
            pkts = [rng.integers(0, 256, 100).astype(np.uint8).tobytes()
                    for _ in range(4)]
            packets.extend(pkts)
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
    up = ch.upsample_exact(buf, 32)
    # modulate_am's absolute level is tiny; use a realistic tuner level
    # so the 8-bit wire quantization sits well under the signal
    wire = ch.to_cu8(up * (0.4 / np.abs(up).max()))

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=2, mode="am",
                              input_format="cu8")
    for lo in range(0, len(wire), 500000):
        rx.push(0, wire[lo:lo + 500000])
    rx.flush()
    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & {bytes(p) for p in packets}) >= 64, len(hdc)


def test_multistation_am(rng):
    """AM mode through the serving API: MA1 audio PDUs reach the
    per-station transport as bit-exact HDC packets after the
    diversity-delay warm-up."""
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    n = 7
    packets = []
    p1_frames = []
    for f in range(n):
        sub = []
        for b in range(8):
            pkts = [rng.integers(0, 256, 100).astype(np.uint8).tobytes()
                    for _ in range(4)]
            packets.extend(pkts)
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
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=2, mode="am")
    for lo in range(0, len(buf), 100000):
        for i in range(2):
            rx.push(i, buf[lo:lo + 100000])
    rx.flush()

    want = {bytes(p) for p in packets}
    for i in range(2):
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want) >= 64, (i, len(hdc & want))


def test_rtltcp_fleet(rng):
    """Fleet serving: two fake rtl_tcp servers stream looping cu8
    captures; RtlTcpFleet tunes both and decodes each station's stream
    through one batched receiver — per-station ID3 titles with no
    cross-station leakage, tuner commands on the wire."""
    import time

    from nrsc5_tpu.io.rtltcp import (CMD_SET_FREQUENCY,
                                     CMD_SET_SAMPLE_RATE)
    from nrsc5_tpu.serve import RtlTcpFleet
    from nrsc5_tpu.tx import channel as ch

    from .test_rtltcp import FakeRtlTcp

    titles = ["Fleet Station A", "Fleet Station B"]
    servers = []
    for t in titles:
        sig, _ = _station_stream(rng, t)
        servers.append(FakeRtlTcp(ch.to_cu8(ch.upsample2(sig)).tobytes()))
        servers[-1].start()

    events = {0: [], 1: []}
    fleet = RtlTcpFleet(
        [("127.0.0.1", s.port) for s in servers],
        [88.5e6, 94.7e6],
        lambda st, ev: events[st].append(ev),
        gain_db=30.0, frames_per_dispatch=1)
    fleet.start()
    try:
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            got = [{e.title for e in events[i] if e.type == EventType.ID3}
                   for i in range(2)]
            if all(titles[i] in got[i] for i in range(2)):
                break
            time.sleep(0.5)
    finally:
        fleet.stop()
        for s in servers:
            s.stop.set()

    for i in range(2):
        got = {e.title for e in events[i] if e.type == EventType.ID3}
        assert titles[i] in got, (i, got)
        assert titles[1 - i] not in got
        assert any(e.type == EventType.HDC for e in events[i])
        ops = [c[0] for c in servers[i].commands]
        assert CMD_SET_SAMPLE_RATE in ops and CMD_SET_FREQUENCY in ops


def test_multistation_mixed_first_bc(rng):
    """Two stations locking at DIFFERENT mid-frame positions: each gets
    its own alignment dispatch (different block counts compile separate
    one-time programs), after which one shared steady program serves
    both frame-aligned."""
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.serve import MultiStationReceiver

    leads = [14, 11]  # first_bc per station -> align 2 and 5 blocks
    titles = ["Mixed BC Zero", "Mixed BC One"]
    locks, tails, want = [], [], []
    for bc, title in zip(leads, titles):
        mats, packets = _station_mats(rng, title, n_frames=3)
        dummy = build_pm_matrix(
            build_p1_fm_frame(
                [rng.integers(0, 256, 280).astype(np.uint8).tobytes()
                 for _ in range(32)], 0, 7, 0),
            np.zeros((16, 80), np.uint8))
        matrix = np.concatenate([dummy[bc * 32:]] + mats)
        bc_seq = np.concatenate([np.arange(bc, 16),
                                 np.tile(np.arange(16), 3)])
        sig = modulate_fm(matrix, bc_seq, 1)
        buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
        buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig
        rcs = np.stack([buf.real, -buf.imag], -1).astype(np.float32)
        lock = rcc.cold_start_rc(rcs)
        assert lock is not None and lock["first_bc"] == bc, (bc, lock)
        locks.append(lock)
        tails.append(np.concatenate(
            [buf[lock["offset"]:], np.zeros(3 * C.FFTCP_FM, np.complex64)]))
        want.append({bytes(p) for p in packets})

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1, locks=locks)
    pos = [0, 0]
    while any(pos[i] < len(tails[i]) for i in range(2)):
        for i in range(2):
            rx.push(i, tails[i][pos[i]:pos[i] + 300000])
            pos[i] += 300000
    rx.flush()

    for i in range(2):
        got = {e.title for e in events[i] if e.type == EventType.ID3}
        assert titles[i] in got, (i, got)
        assert titles[1 - i] not in got
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want[i]) >= 64, (i, len(hdc & want[i]))


def test_multistation_checkpoint_resume(rng, tmp_path):
    """Serving checkpoint/resume: device carried state + host queues
    snapshot to a pytree (.npz-roundtripped through utils.checkpoint),
    and a fresh receiver restored from it continues the decode — the
    device chain bit-exactly (BER 0 on every post-resume frame), the
    transport relocking within a frame."""
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.utils.checkpoint import load_state, save_state

    sig, packets = _station_stream(rng, "Resume Title", n_frames=4)
    want = {bytes(p) for p in packets}
    split = int(len(sig) * 0.55)

    ev1, ev2 = [], []
    rx1 = MultiStationReceiver(1, lambda st, ev: ev1.append(ev),
                               frames_per_dispatch=1)
    for lo in range(0, split, 200000):
        rx1.push(0, sig[lo:min(lo + 200000, split)])

    # in-process pytree roundtrip (needs a structure template) ...
    state = rx1.checkpoint()
    path = str(tmp_path / "serve_ckpt.npz")
    save_state(path, state)
    state = load_state(path, state)
    # ... and the cross-process flow: save() names every leaf so a FRESH
    # identically-parameterized receiver can load() with no template
    path2 = str(tmp_path / "serve_ckpt2.npz")
    rx1.save(path2)

    rx2 = MultiStationReceiver(1, lambda st, ev: ev2.append(ev),
                               frames_per_dispatch=1)
    rx2.load(path2)
    for lo in range(split, len(sig), 200000):
        rx2.push(0, sig[lo:lo + 200000])
    rx2.flush()

    hdc1 = {e.data for e in ev1
            if e.type == EventType.HDC and not e.crc_error}
    hdc2 = {e.data for e in ev2
            if e.type == EventType.HDC and not e.crc_error}
    assert hdc1 & want and hdc2 & want
    # transport state is not checkpointed: allow up to ~1 frame of
    # elastic-buffer loss around the boundary, nothing more
    assert len((hdc1 | hdc2) & want) >= len(want) - 40, \
        (len(hdc1 & want), len(hdc2 & want), len(want))
    # the post-resume device chain is bit-exact (re-encode BER 0)
    bers = [e.cber for e in ev2 if e.type == EventType.BER]
    assert bers and max(bers) == 0.0, bers
    assert any(e.type == EventType.ID3 and e.title == "Resume Title"
               for e in ev2)


def test_multistation_am_coldstart_locks(rng):
    """AM cold-start flow through the serving API (both MA1 and MA3 —
    the reference cannot cold-start MA3 at all, its pre-sync band
    filter nulls the all-digital band): cold_start_am_rc locks an
    impaired capture, locks= seeds the batched receiver, HDC packets
    come out bit-exact."""
    from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import channel as ch

    from .capture_helpers import build_am_capture

    bin_hz = C.SAMPLE_RATE_CS16_AM / C.FFT_AM
    for ma3 in (False, True):
        sig, packets = build_am_capture(rng, n_frames=9, ma3=ma3)
        imp = ch.impair(sig, sample_offset=641,
                        cfo_hz=2 * bin_hz + 23.0, snr_db=30.0,
                        sample_rate=C.SAMPLE_RATE_CS16_AM, rng=rng)
        rcs = np.stack([imp.real, imp.imag], -1).astype(np.float32)
        lock = scar.cold_start_am_rc(rcs)
        assert lock is not None and lock["ma3"] == ma3

        events = []
        rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                                  frames_per_dispatch=2, mode="am",
                                  ma3=ma3, locks=lock)
        tail = imp[lock["offset"]:]
        for lo in range(0, len(tail), 150000):
            rx.push(0, tail[lo:lo + 150000])
        rx.flush()

        want = {bytes(b) for _, pk in packets for b in pk}
        hdc = {e.data for e in events
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want) >= 48, (ma3, len(hdc & want))


def test_multistation_cu8_coldstart_locks(rng):
    """cu8 wire + FM cold-start locks together: the alignment dispatch's
    sample-queue gate must account for the raw rate and decimator
    overlap (regression: it compared raw queue depth against the
    chain-rate buffer length and underflowed)."""
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx import channel as ch

    mats, packets = _station_mats(rng, "CU8 Cold Title", n_frames=3)
    dummy = build_pm_matrix(
        build_p1_fm_frame(
            [rng.integers(0, 256, 280).astype(np.uint8).tobytes()
             for _ in range(32)], 0, 7, 0),
        np.zeros((16, 80), np.uint8))
    matrix = np.concatenate([dummy[14 * 32:]] + mats)
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), 3)])
    full = modulate_fm(matrix, bc_seq, 1)
    capture = np.zeros(len(full) + C.FFTCP_FM, np.complex64)
    capture[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(full)] = full

    # lock at the internal rate (the documented flow: decimate, lock,
    # then stream the raw wire from 2x the lock offset)
    rcs = np.stack([capture.real, -capture.imag], -1).astype(np.float32)
    lock = rcc.cold_start_rc(rcs)
    assert lock is not None and lock["first_bc"] == 14

    wire = ch.to_cu8(ch.upsample2(np.concatenate(
        [capture, np.zeros(3 * C.FFTCP_FM, np.complex64)])))
    raw = wire.tobytes()[4 * lock["offset"]:]  # 2 samples x 2 bytes

    events = []
    rx = MultiStationReceiver(1, lambda st, ev: events.append(ev),
                              frames_per_dispatch=1, locks=lock,
                              input_format="cu8")
    for lo in range(0, len(raw), 400001):
        rx.push(0, raw[lo:lo + 400001])
    rx.flush()
    hdc = {e.data for e in events
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & {bytes(p) for p in packets}) >= 64, len(hdc)
    assert any(e.type == EventType.ID3 and e.title == "CU8 Cold Title"
               for e in events)


def test_rtltcp_fleet_dead_tuner(rng):
    """A dropped tuner must not stall the fleet: the dead station gets a
    LOST_DEVICE event and silence padding; the live station keeps
    decoding."""
    import time

    from nrsc5_tpu.serve import RtlTcpFleet
    from nrsc5_tpu.tx import channel as ch

    from .test_rtltcp import FakeRtlTcp

    servers = []
    for t in ("Live Station", "Doomed Station"):
        sig, _ = _station_stream(rng, t)
        servers.append(FakeRtlTcp(ch.to_cu8(ch.upsample2(sig)).tobytes()))
        servers[-1].start()

    events = {0: [], 1: []}
    fleet = RtlTcpFleet(
        [("127.0.0.1", s.port) for s in servers], [88.5e6, 94.7e6],
        lambda st, ev: events[st].append(ev),
        gain_db=30.0, frames_per_dispatch=1)
    fleet.start()
    try:
        deadline = time.monotonic() + 240
        # wait for first decode on both, then kill tuner 1
        while time.monotonic() < deadline:
            if all(any(e.type == EventType.HDC for e in events[i])
                   for i in range(2)):
                break
            time.sleep(0.5)
        servers[1].stop.set()
        hdc_before = sum(1 for e in events[0]
                         if e.type == EventType.HDC)
        # sustained decode well past the watchdog trip latency (2 bad
        # frames + depth-2 pipeline lag): 4 more frames, not just 1 —
        # a post-trip fleet stall would cap the live station earlier
        while time.monotonic() < deadline:
            lost = any(e.type == EventType.LOST_DEVICE
                       for e in events[1])
            hdc_now = sum(1 for e in events[0]
                          if e.type == EventType.HDC)
            if lost and hdc_now >= hdc_before + 128:
                break
            time.sleep(0.5)
    finally:
        fleet.stop()
        for s in servers:
            s.stop.set()

    assert any(e.type == EventType.LOST_DEVICE for e in events[1])
    assert sum(1 for e in events[0] if e.type == EventType.HDC) \
        >= hdc_before + 128, "live station stalled after tuner loss"


def test_multistation_auto_relock(rng):
    """Self-healing serving: a mid-stream sample gap breaks the FINE-only
    lock; the per-station BER watchdog emits LOST_SYNC, cold-start
    re-acquisition relocks (SYNC), and decode resumes bit-exact — while
    the OTHER station keeps decoding its clean stream throughout."""
    from nrsc5_tpu.serve import MultiStationReceiver

    # recovery costs ~5 frames: 2 for the BER watchdog, 2 of pipeline
    # lag (depth-2 outputs in flight), ~1 for the probe offset + frame
    # alignment — give the post-gap stream enough runway to re-decode
    good, good_packets = _station_stream(rng, "Clean Station",
                                         n_frames=12)
    pre, pre_packets = _station_stream(rng, "Before Gap", n_frames=3)
    post, post_packets = _station_stream(rng, "After Gap", n_frames=9)
    # timing jump mid-stream: drop a non-multiple-of-frame chunk
    gappy = np.concatenate([pre[:len(pre) - 33333], post])

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1)
    n = max(len(good), len(gappy))
    for lo in range(0, n, 250000):
        rx.push(0, good[lo:lo + 250000])
        rx.push(1, gappy[lo:lo + 250000])
    rx.flush()

    # station 0 sailed through
    hdc0 = {e.data for e in events[0]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc0 & {bytes(p) for p in good_packets}) >= 256
    assert not any(e.type == EventType.LOST_SYNC for e in events[0])

    # station 1: decode, break, relock, decode again
    kinds = [e.type for e in events[1]]
    assert EventType.LOST_SYNC in kinds and EventType.SYNC in kinds
    assert kinds.index(EventType.LOST_SYNC) < len(kinds) - 1
    hdc1 = {e.data for e in events[1]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc1 & {bytes(p) for p in pre_packets}) >= 32
    assert len(hdc1 & {bytes(p) for p in post_packets}) >= 32, \
        len(hdc1 & {bytes(p) for p in post_packets})
    titles1 = {e.title for e in events[1] if e.type == EventType.ID3}
    assert "After Gap" in titles1, titles1


def test_multistation_relock_never_locks(rng):
    """A station whose carrier never comes back (noise after the gap)
    must not stall the batch or grow queues without bound: the probe
    retries at most once per dispatch while the station keeps flowing
    through the dispatches, and the OTHER station decodes to the end."""
    from nrsc5_tpu.serve import MultiStationReceiver

    good, good_packets = _station_stream(rng, "Survivor", n_frames=9)
    pre, _ = _station_stream(rng, "Doomed", n_frames=3)
    noise = (rng.normal(0, 0.05, (len(good), 2))).astype(np.float32)
    bad = np.concatenate([
        np.stack([pre.real, -pre.imag], -1).astype(np.float32), noise])

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1)
    for lo in range(0, len(bad), 250000):
        rx.push(0, good[lo:lo + 250000])
        rx.push(1, bad[lo:lo + 250000])
        # loose in-flight sanity: the watchdog needs ~4 dispatches to
        # trip, during which a garbage carry can under-consume
        assert max(rx._sizes) < rx._needed + 6_000_000, rx._sizes
    # once probing, a failed probe trims the garbage backlog: the
    # never-locking station's queue is hard-bounded at a dispatch + a
    # probe window
    assert rx._sizes[1] < rx._needed + 800000, rx._sizes
    rx.flush()

    hdc0 = {e.data for e in events[0]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc0 & {bytes(p) for p in good_packets}) >= 256
    kinds1 = [e.type for e in events[1]]
    assert EventType.LOST_SYNC in kinds1
    assert EventType.SYNC not in kinds1  # noise never relocks


def _am_stream(rng, n_frames):
    """Steady-state MA1 stream (frame-aligned lead-in) + HDC packets."""
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    packets = []
    p1_frames = []
    for f in range(n_frames):
        sub = []
        for b in range(8):
            pkts = [rng.integers(0, 256, 100).astype(np.uint8).tobytes()
                    for _ in range(4)]
            packets.extend(pkts)
            sub.append(build_p1_am_frame(pkts, 0, (f * 8 + b) % 8,
                                         ((f * 8 + b) * 4) % 64))
        p1_frames.append(np.stack(sub))
    p3 = rng.integers(0, 2, (n_frames, C.P3_FRAME_LEN_MA1)) \
        .astype(np.uint8)
    mats = EAM.interleave_frames(
        [EAM.encode_p1_am(p1_frames[f]) for f in range(n_frames)],
        [EAM.encode_p3_am(p3[f], False) for f in range(n_frames)], False)
    pids_codes = np.stack([EAM.encode_pids_am(
        rng.integers(0, 2, 80).astype(np.uint8))
        for _ in range(n_frames * 8)])
    ref = np.stack([EAM.am_ref_bits(b % 8, 1)
                    for b in range(n_frames * 8)])
    sig = modulate_am(mats, pids_codes, ref, False)
    buf = np.zeros(len(sig) + C.FFTCP_AM, np.complex64)
    buf[C.FFTCP_AM // 2:C.FFTCP_AM // 2 + len(sig)] = sig
    return buf, packets


def test_multistation_am_auto_relock(rng):
    """AM twin of test_multistation_auto_relock: a mid-stream sample gap
    kills the lock; the K=9-margin watchdog emits LOST_SYNC, AM
    cold-start re-acquisition relocks (SYNC), the diversity warm-up
    re-arms, and decode resumes bit-exact — while the other station
    keeps decoding throughout (VERDICT r2 item 3; reference analog:
    src/decode.c:507-554 am_diversity_wait + src/sync.c:649-666)."""
    from nrsc5_tpu.serve import MultiStationReceiver

    # budget after the gap: ~2 frames watchdog + ~2 in flight + 3 probe
    # buffer + 3 diversity warm-up + >=2 decoded
    good, good_packets = _am_stream(rng, 16)
    pre, pre_packets = _am_stream(rng, 4)
    post, post_packets = _am_stream(rng, 12)
    gappy = np.concatenate([pre[:len(pre) - 7777], post])

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1, mode="am")
    n = max(len(good), len(gappy))
    for lo in range(0, n, 50000):
        rx.push(0, good[lo:lo + 50000])
        rx.push(1, gappy[lo:lo + 50000])
    rx.flush()

    hdc0 = {e.data for e in events[0]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc0 & {bytes(p) for p in good_packets}) >= 128
    assert not any(e.type == EventType.LOST_SYNC for e in events[0])

    kinds = [e.type for e in events[1]]
    assert EventType.LOST_SYNC in kinds and EventType.SYNC in kinds
    hdc1 = {e.data for e in events[1]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc1 & {bytes(p) for p in pre_packets}) >= 8
    assert len(hdc1 & {bytes(p) for p in post_packets}) >= 8, \
        len(hdc1 & {bytes(p) for p in post_packets})


def test_multistation_am_relock_never_locks(rng):
    """AM twin of test_multistation_relock_never_locks: a carrier that
    never returns (noise) trips LOST_SYNC, never SYNCs, keeps its queue
    hard-bounded, and does not stall the surviving station."""
    from nrsc5_tpu.serve import MultiStationReceiver

    good, good_packets = _am_stream(rng, 10)
    pre, _ = _am_stream(rng, 4)
    noise = (rng.normal(0, 0.05, (len(good), 2))).astype(np.float32)
    bad = np.concatenate([
        np.stack([pre.real, pre.imag], -1).astype(np.float32), noise])

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1, mode="am")
    for lo in range(0, len(bad), 50000):
        rx.push(0, good[lo:lo + 50000])
        rx.push(1, bad[lo:lo + 50000])
    assert rx._sizes[1] < rx._needed + 600000, rx._sizes
    rx.flush()

    hdc0 = {e.data for e in events[0]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc0 & {bytes(p) for p in good_packets}) >= 128
    kinds1 = [e.type for e in events[1]]
    assert EventType.LOST_SYNC in kinds1
    assert EventType.SYNC not in kinds1


def test_align_wait_does_not_stall_fleet(rng):
    """A station buffering its one-time alignment dispatch must not
    pause the batched dispatches for the rest of the fleet (round-2
    head-of-line stall): it rides the batch with a frozen carry until
    its alignment samples arrive, and its own decode is unharmed."""
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.serve import MultiStationReceiver
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame

    good, good_packets = _station_stream(rng, "Fleet Flows", n_frames=6)

    # station 1 locks mid-frame -> needs a 2-block alignment dispatch
    bc, title = 14, "Late Joiner"
    mats, late_packets = _station_mats(rng, title, n_frames=4)
    dummy = build_pm_matrix(
        build_p1_fm_frame(
            [rng.integers(0, 256, 280).astype(np.uint8).tobytes()
             for _ in range(32)], 0, 7, 0),
        np.zeros((16, 80), np.uint8))
    matrix = np.concatenate([dummy[bc * 32:]] + mats)
    bc_seq = np.concatenate([np.arange(bc, 16),
                             np.tile(np.arange(16), 4)])
    sig = modulate_fm(matrix, bc_seq, 1)
    buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
    buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig
    rcs = np.stack([buf.real, -buf.imag], -1).astype(np.float32)
    lock = rcc.cold_start_rc(rcs)
    assert lock is not None and lock["first_bc"] == bc
    late = np.concatenate(
        [buf[lock["offset"]:], np.zeros(3 * C.FFTCP_FM, np.complex64)])

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1,
                              locks=[rcc.cold_start_rc(
                                  np.stack([good.real, -good.imag], -1)
                                  .astype(np.float32)), lock])
    # phase 1: station 0 streams fully, station 1 sends almost nothing
    # (not even its alignment window) — station 0 must decode anyway
    rx.push(1, late[:1000])
    for lo in range(0, len(good), 300000):
        rx.push(0, good[lo:lo + 300000])
    rx.drain()
    hdc0 = {e.data for e in events[0]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc0 & {bytes(p) for p in good_packets}) >= 96, \
        "fleet stalled behind an aligning station"

    # phase 2: the late joiner's stream arrives; its alignment (frozen
    # carry) must still be intact and its decode bit-exact.  Station
    # 0's capture has ended — pad it with silence so the fused batch
    # keeps firing (what RtlTcpFleet._pad_dead does for dead tuners)
    for lo in range(1000, len(late), 300000):
        rx.push(1, late[lo:lo + 300000])
        rx.push(0, np.zeros(300000, np.complex64))
    rx.flush()
    hdc1 = {e.data for e in events[1]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc1 & {bytes(p) for p in late_packets}) >= 64
    titles1 = {e.title for e in events[1] if e.type == EventType.ID3}
    assert title in titles1


def test_multistation_mesh_sharded(rng):
    """Serving over a jax.sharding.Mesh: the station batch axis shards
    across devices (mesh=2 of the 8 virtual CPU devices) and must emit
    the identical per-station event stream as the unsharded receiver —
    the multi-chip scale-out contract (no collectives: every chain op
    is batchwise over stations)."""
    import jax
    from jax.sharding import Mesh

    from nrsc5_tpu.serve import MultiStationReceiver

    titles = ["Mesh Station A", "Mesh Station B"]
    streams, want = [], []
    for t in titles:
        sig, packets = _station_stream(rng, t)
        streams.append(sig)
        want.append({bytes(p) for p in packets})

    def run(mesh):
        events = {0: [], 1: []}
        rx = MultiStationReceiver(
            2, lambda st, ev: events[st].append(ev),
            frames_per_dispatch=1, mesh=mesh)
        pos = [0, 0]
        chunk = 64 * 1024 + 13
        while any(pos[i] < len(streams[i]) for i in range(2)):
            for i in range(2):
                rx.push(i, streams[i][pos[i]:pos[i] + chunk])
                pos[i] += chunk
        rx.flush()
        return events

    mesh = Mesh(np.array(jax.devices()[:2]), ("station",))
    sharded = run(mesh)
    plain = run(None)
    for i, t in enumerate(titles):
        hdc_s = [e.data for e in sharded[i]
                 if e.type == EventType.HDC and not e.crc_error]
        hdc_p = [e.data for e in plain[i]
                 if e.type == EventType.HDC and not e.crc_error]
        assert hdc_s == hdc_p and len(hdc_s) >= 64  # bit-exact parity
        assert t in {e.title for e in sharded[i]
                     if e.type == EventType.ID3}


def _ev_key(ev):
    """Normalize an event to a comparable tuple (arrays -> bytes)."""
    def norm(v):
        if isinstance(v, np.ndarray):
            return (v.dtype.str, v.shape, v.tobytes())
        if isinstance(v, (bytes, str, int, float, bool, type(None))):
            return v
        return repr(v)
    return (ev.type,) + tuple(
        (k, norm(v)) for k, v in sorted(ev.payload.items()))


def test_heterogeneous_psmi_fleet(rng):
    """A fleet mixing MP1 and MP3 carriers served through ONE
    HeterogeneousReceiver surface (reference: one session per station,
    each with its own mode, src/nrsc5.c:325-358): every station's event
    stream is bit-exact vs a homogeneous per-mode receiver fed the same
    samples."""
    from nrsc5_tpu.serve import HeterogeneousReceiver, MultiStationReceiver
    from nrsc5_tpu.tx.encoder import build_px_stream
    from nrsc5_tpu.tx.transport_encoder import build_audio_pdu, pack_frame

    # stations 0, 2: MP1; station 1: MP3 (PM audio + SPS over PX1)
    titles = ["Het MP1 Zero", "Het MP3 One", "Het MP1 Two"]
    streams, want, sps_want = [], [], set()
    for st, t in enumerate(titles):
        if st != 1:
            sig, packets = _station_stream(rng, t, n_frames=3)
            streams.append(sig)
            want.append({bytes(p) for p in packets})
            continue
        # MP3 station: 1 interleaver-IV cycle of SPS + 2 P1 frames... the
        # IV warm-up spans a full cycle, so run 3 cycles (6 P1 frames)
        n_cycles = 3
        fl = C.P3_FRAME_LEN_MP3_MP11
        p3_bytes = (fl - 24) // 8
        p3_bits = np.zeros((n_cycles, 16, fl), np.uint8)
        for cyc in range(n_cycles):
            for f in range(16):
                pkts = [rng.integers(0, 256, 150).astype(np.uint8)
                        .tobytes() for _ in range(3)]
                sps_want.update(pkts)
                g = cyc * 16 + f
                pdu = build_audio_pdu(pkts, program=1, pdu_seq=g % 8,
                                      seq=(g * 3) % 64,
                                      total_len=p3_bytes)
                p3_bits[cyc, f] = pack_frame(pdu, fl, C.PCI_AUDIO)
        px = build_px_stream(p3_bits, fl).reshape(
            n_cycles * 32 * C.BLKSZ, -1)
        mats, packets = _station_mats(rng, t, n_frames=n_cycles * 2)
        sig = modulate_fm(np.concatenate(mats),
                          np.tile(np.arange(16), n_cycles * 2), 3,
                          px1_signs=px)
        buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
        buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig
        streams.append(buf)
        want.append({bytes(p) for p in packets})

    def run(factory):
        events = {i: [] for i in range(3)}
        rx = factory(lambda st, ev: events[st].append(ev))
        pos = [0, 0, 0]
        chunk = 48 * 1024 + 17
        while any(pos[i] < len(streams[i]) for i in range(3)):
            for i in range(3):
                rx.push(i, streams[i][pos[i]:pos[i] + chunk])
                pos[i] += chunk
        rx.flush()
        return events

    het = run(lambda cb: HeterogeneousReceiver(
        3, cb, psmis=[1, 3, 1], frames_per_dispatch=2))

    # oracle: homogeneous per-mode receivers over the same streams
    def homo(cb):
        mp1 = MultiStationReceiver(
            2, lambda s, e: cb([0, 2][s], e),
            frames_per_dispatch=2, psmi=1)
        mp3 = MultiStationReceiver(
            1, lambda s, e: cb(1, e), frames_per_dispatch=2, psmi=3)

        class _Split:
            def push(self, st, x):
                (mp3 if st == 1 else mp1).push(st // 2, x)

            def flush(self):
                mp1.flush()
                mp3.flush()
        return _Split()
    ref = run(homo)

    for i in range(3):
        assert [_ev_key(e) for e in het[i]] \
            == [_ev_key(e) for e in ref[i]], f"station {i} diverges"
        got_titles = {e.title for e in het[i]
                      if e.type == EventType.ID3 and e.program == 0}
        assert titles[i] in got_titles, (i, got_titles)
        hdc = {e.data for e in het[i]
               if e.type == EventType.HDC and not e.crc_error
               and e.program == 0}
        assert len(hdc & want[i]) >= 64, (i, len(hdc & want[i]))
    sps = {e.data for e in het[1]
           if e.type == EventType.HDC and e.program == 1
           and not e.crc_error}
    assert len(sps & sps_want) >= 32, len(sps & sps_want)


def test_heterogeneous_fleet_checkpoint(rng, tmp_path):
    """Mixed-mode fleet checkpoint: save mid-stream, restore into a
    fresh identically-parameterized wrapper in-place, decode the rest —
    packets match an uninterrupted run."""
    from nrsc5_tpu.serve import HeterogeneousReceiver

    from nrsc5_tpu.tx.encoder import build_px_stream

    titles = ["Ckpt A", "Ckpt B"]
    streams, want = [], []
    n_frames = 4
    for st, t in enumerate(titles):
        if st == 0:
            sig, packets = _station_stream(rng, t, n_frames=n_frames)
            streams.append(sig)
        else:  # true MP3 signal (random P3 content on the PX1 channel)
            fl = C.P3_FRAME_LEN_MP3_MP11
            p3_bits = rng.integers(
                0, 2, (n_frames // 2, 16, fl)).astype(np.uint8)
            px = build_px_stream(p3_bits, fl).reshape(
                n_frames * 16 * C.BLKSZ, -1)
            mats, packets = _station_mats(rng, t, n_frames=n_frames)
            s = modulate_fm(np.concatenate(mats),
                            np.tile(np.arange(16), n_frames), 3,
                            px1_signs=px)
            buf = np.zeros(len(s) + C.FFTCP_FM, np.complex64)
            buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(s)] = s
            streams.append(buf)
        want.append({bytes(p) for p in packets})

    def mk(cb):
        return HeterogeneousReceiver(2, cb, psmis=[1, 3],
                                     frames_per_dispatch=1)

    events = {0: [], 1: []}
    rx = mk(lambda st, ev: events[st].append(ev))
    cut = 3 * len(streams[0]) // 7
    for i in range(2):
        rx.push(i, streams[i][:cut])
    rx.drain()
    rx.save(str(tmp_path / "fleet.npz"))

    rx2 = mk(lambda st, ev: events[st].append(ev))
    rx2.load(str(tmp_path / "fleet.npz"))
    for i in range(2):
        rx2.push(i, streams[i][cut:])
    rx2.flush()

    for i in range(2):
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want[i]) >= 96, (i, len(hdc & want[i]))


def test_multistation_mp5(rng):
    """MP5 (cm 5) stations through the fused serving chain: the 14-partition
    equalizer geometry with undecoded extended occupancy (reference:
    src/sync.c:343-357) decodes PM cleanly in the batch program."""
    from nrsc5_tpu.serve import MultiStationReceiver

    titles = ["MP5 Station Zero", "MP5 Station One"]
    streams, want = [], []
    for t in titles:
        mats, packets = _station_mats(rng, t, n_frames=3)
        matrix = np.concatenate(mats)
        n_ext = C.partitions_per_band(5) - C.PM_PARTITIONS
        ext = rng.choice(
            np.array([-1, 1], np.int8),
            (len(matrix), 2 * n_ext * C.PARTITION_DATA_CARRIERS * 2))
        sig = modulate_fm(matrix, np.tile(np.arange(16), 3), 5,
                          ext_signs=ext)
        buf = np.zeros(len(sig) + C.FFTCP_FM, np.complex64)
        buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(sig)] = sig
        streams.append(buf)
        want.append({bytes(p) for p in packets})

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1, psmi=5)
    pos = [0, 0]
    chunk = 48 * 1024 + 17
    while any(pos[i] < len(streams[i]) for i in range(2)):
        for i in range(2):
            rx.push(i, streams[i][pos[i]:pos[i] + chunk])
            pos[i] += chunk
    rx.flush()

    for i in range(2):
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error
               and e.program == 0}
        assert len(hdc & want[i]) >= 64, (i, len(hdc & want[i]))
        got_titles = {e.title for e in events[i]
                      if e.type == EventType.ID3 and e.program == 0}
        assert titles[i] in got_titles, (i, got_titles)


def test_multistation_cold_start(rng):
    """``cold_start=True`` acquires each station's initial lock (timing +
    CFO) from the pushed stream itself — the live-tuner mode: exactly one
    SYNC per station, never a LOST_SYNC, no pre-lock garbage HDC, and the
    stations lock independently (different unknown offsets + CFOs)."""
    from nrsc5_tpu.serve import MultiStationReceiver

    want, streams = [], []
    for i, (off, cfo) in enumerate(((12345, 180.0), (77777, -250.0))):
        sig, packets = _station_stream(rng, f"Cold Station {i}",
                                       n_frames=8)
        want.append({bytes(p) for p in packets})
        n = np.arange(len(sig) - off)
        rot = np.exp(2j * np.pi * cfo / C.SAMPLE_RATE_CS16_FM * n)
        streams.append((sig[off:] * rot).astype(np.complex64))

    events = {0: [], 1: []}
    rx = MultiStationReceiver(2, lambda st, ev: events[st].append(ev),
                              frames_per_dispatch=1, cold_start=True)
    n = max(map(len, streams))
    for lo in range(0, n, 250000):
        for i in range(2):
            rx.push(i, streams[i][lo:lo + 250000])
    rx.flush()

    for i in range(2):
        kinds = [e.type for e in events[i]]
        assert kinds.count(EventType.SYNC) == 1, (i, kinds)
        assert EventType.LOST_SYNC not in kinds, i
        hdc = [e for e in events[i]
               if e.type == EventType.HDC and not e.crc_error]
        # every emitted packet is genuine (no pre-lock garbage decode)
        assert {e.data for e in hdc} <= want[i], i
        assert len(hdc) >= 5 * 32, (i, len(hdc))  # ~2 frames acquisition


def test_cold_start_excludes_locks():
    from nrsc5_tpu.serve import MultiStationReceiver

    with pytest.raises(AssertionError):
        MultiStationReceiver(1, lambda st, ev: None, cold_start=True,
                             locks={"psmi": 1})

def test_heterogeneous_mixed_band(rng):
    """An FM + AM fleet through ONE HeterogeneousReceiver (the
    reference's per-dongle sessions each pick their own band,
    src/nrsc5.c:325-358): stations grouped by (band, service mode),
    every station's event stream bit-exact vs a per-mode receiver fed
    the same samples."""
    from nrsc5_tpu.serve import HeterogeneousReceiver, MultiStationReceiver

    fm_sig, fm_packets = _station_stream(rng, "Band FM", n_frames=3)
    am_sig, am_packets = _am_stream(rng, 7)
    streams = [fm_sig, am_sig]
    want = [{bytes(p) for p in fm_packets},
            {bytes(p) for p in am_packets}]

    def run(factory):
        events = {0: [], 1: []}
        rx = factory(lambda st, ev: events[st].append(ev))
        pos = [0, 0]
        chunk = 48 * 1024 + 17
        while any(pos[i] < len(streams[i]) for i in range(2)):
            for i in range(2):
                rx.push(i, streams[i][pos[i]:pos[i] + chunk])
                pos[i] += chunk
        rx.flush()
        return events

    het = run(lambda cb: HeterogeneousReceiver(
        2, cb, modes=["fm", "am"], psmis=[1, None],
        frames_per_dispatch=2))

    def homo(cb):
        fm = MultiStationReceiver(1, lambda s, e: cb(0, e),
                                  frames_per_dispatch=2, psmi=1)
        am = MultiStationReceiver(1, lambda s, e: cb(1, e),
                                  frames_per_dispatch=2, mode="am")

        class _Split:
            def push(self, st, x):
                (am if st else fm).push(0, x)

            def flush(self):
                fm.flush()
                am.flush()
        return _Split()
    ref = run(homo)

    for i in range(2):
        assert [_ev_key(e) for e in het[i]] \
            == [_ev_key(e) for e in ref[i]], f"station {i} diverges"
        hdc = {e.data for e in het[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want[i]) >= 64, (i, len(hdc & want[i]))
        assert not (hdc & want[1 - i] - want[i])  # no cross-band leak


def test_heterogeneous_auto_discovery(rng):
    """Serve-side mode DISCOVERY (VERDICT r4 item 1): an FM-MP1 +
    FM-MP3 + AM-MA1 + FM-MP1 fleet pushed as raw cu8 wire bytes through
    one HeterogeneousReceiver with NO mode arguments.  Each station's
    band + service mode is identified from its own stream; same-mode
    stations fuse into one growing batch program (MultiStationReceiver.
    _admit), and each station syncs exactly once with zero cross-station
    leakage.  (Reference contract: a session never declares its mode up
    front — src/sync.c:366-421 discovers psmi live.)"""
    from nrsc5_tpu.serve import HeterogeneousReceiver
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_px_stream

    titles = ["Auto MP1 A", "Auto MP3 B", None, "Auto MP1 D"]
    streams, want = [], []
    for st, t in enumerate(titles):
        if st == 2:
            am, pkts = _am_stream(rng, 10)
            up = ch.upsample_exact(am, 32)
            streams.append(ch.to_cu8(up * (0.4 / np.abs(up).max()))
                           .tobytes())
        elif st == 1:  # true MP3 signal (random P3 on the PX1 channel)
            n_frames = 4
            fl = C.P3_FRAME_LEN_MP3_MP11
            p3_bits = rng.integers(
                0, 2, (n_frames // 2, 16, fl)).astype(np.uint8)
            px = build_px_stream(p3_bits, fl).reshape(
                n_frames * 16 * C.BLKSZ, -1)
            mats, pkts = _station_mats(rng, t, n_frames=n_frames)
            s = modulate_fm(np.concatenate(mats),
                            np.tile(np.arange(16), n_frames), 3,
                            px1_signs=px)
            buf = np.zeros(len(s) + C.FFTCP_FM, np.complex64)
            buf[C.FFTCP_FM // 2:C.FFTCP_FM // 2 + len(s)] = s
            streams.append(ch.to_cu8(ch.upsample2(buf)).tobytes())
        else:
            sig, pkts = _station_stream(rng, t, n_frames=4)
            streams.append(ch.to_cu8(ch.upsample2(sig)).tobytes())
        want.append({bytes(p) for p in pkts})

    events = {i: [] for i in range(4)}
    rx = HeterogeneousReceiver(4, lambda st, ev: events[st].append(ev),
                               cold_start=True, input_format="cu8",
                               frames_per_dispatch=2)
    chunk = 2 * 1000 * 1000
    n = max(len(w) for w in streams)
    for lo in range(0, n, chunk):
        for i in range(4):
            rx.push(i, streams[i][lo:lo + chunk])
    rx.flush()

    assert rx.station_modes == [("fm", 1), ("fm", 3), ("am", False),
                                ("fm", 1)], rx.station_modes
    # MP1 stations A and D share ONE fused group (grown via _admit)
    assert sorted((k, g.n_stations)
                  for k, g in zip(rx._keys, rx._groups)) == \
        [(("am", False), 1), (("fm", 1), 2), (("fm", 3), 1)]
    for i in range(4):
        kinds = [e.type for e in events[i]]
        assert kinds.count(EventType.SYNC) == 1, (i, kinds)
        assert EventType.LOST_SYNC not in kinds, i
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want[i]) >= 32, (i, len(hdc & want[i]))
        for j in range(4):  # no cross-station / cross-band leakage
            if j != i:
                assert not (hdc & want[j] - want[i]), (i, j)
    for i in (0, 1, 3):
        got = {e.title for e in events[i] if e.type == EventType.ID3}
        assert titles[i] in got, (i, got)


def test_heterogeneous_mixed_band_relock(rng):
    """Self-healing composes across bands: a mixed FM + AM cold-start
    fleet where the FM stream has a mid-stream timing hole — the FM
    station loses sync and re-acquires (LOST_SYNC then SYNC) while the
    AM station decodes its clean stream throughout, unaffected."""
    from nrsc5_tpu.serve import HeterogeneousReceiver

    pre, pre_packets = _station_stream(rng, "Het Before Gap", n_frames=3)
    post, post_packets = _station_stream(rng, "Het After Gap", n_frames=9)
    gappy = np.concatenate([pre[:len(pre) - 33333], post])
    am_sig, am_packets = _am_stream(rng, 9)

    events = {0: [], 1: []}
    rx = HeterogeneousReceiver(2, lambda st, ev: events[st].append(ev),
                               modes=["fm", "am"], psmis=[1, None],
                               cold_start=True, frames_per_dispatch=1)
    # AM's internal rate is 16x slower: pace its pushes accordingly so
    # both stations finish together
    for lo in range(0, len(gappy), 250000):
        rx.push(0, gappy[lo:lo + 250000])
        am_lo = lo // 16
        rx.push(1, am_sig[am_lo:am_lo + 250000 // 16])
    rx.push(1, am_sig[len(gappy) // 16:])
    rx.flush()

    kinds0 = [e.type for e in events[0]]
    assert EventType.LOST_SYNC in kinds0
    assert kinds0.count(EventType.SYNC) >= 2, kinds0  # initial + re-lock
    hdc0 = {e.data for e in events[0]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc0 & {bytes(p) for p in post_packets}) >= 32

    kinds1 = [e.type for e in events[1]]
    assert EventType.LOST_SYNC not in kinds1
    assert kinds1.count(EventType.SYNC) == 1
    hdc1 = {e.data for e in events[1]
            if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc1 & {bytes(p) for p in am_packets}) >= 64


def test_heterogeneous_auto_checkpoint(rng, tmp_path):
    """Auto-discovery fleet checkpoint: save while one station is
    grouped and another is still UNDISCOVERED (its staging queue and
    the group-composition header persist), load into a fresh
    no-mode-arguments wrapper, finish the stream — both stations
    decode."""
    from nrsc5_tpu.serve import HeterogeneousReceiver
    from nrsc5_tpu.tx import channel as ch

    fm_sig, fm_packets = _station_stream(rng, "Ckpt Auto FM", n_frames=4)
    fm_wire = ch.to_cu8(ch.upsample2(fm_sig)).tobytes()
    am_sig, am_packets = _am_stream(rng, 10)
    up = ch.upsample_exact(am_sig, 32)
    am_wire = ch.to_cu8(up * (0.4 / np.abs(up).max())).tobytes()

    def mk(cb):
        return HeterogeneousReceiver(2, cb, cold_start=True,
                                     input_format="cu8",
                                     frames_per_dispatch=2)

    events = {0: [], 1: []}
    rx = mk(lambda st, ev: events[st].append(ev))
    # enough for the FM station to discover + sync, NOT enough for the
    # AM probe window (the AM station must checkpoint as staged)
    cut = 2 * 3_000_000
    for i, w in enumerate((fm_wire, am_wire)):
        rx.push(i, w[:cut])
    rx.drain()
    assert rx.station_modes[0] == ("fm", 1)
    assert rx.station_modes[1] is None  # still staged
    rx.save(str(tmp_path / "auto_fleet.npz"))

    rx2 = mk(lambda st, ev: events[st].append(ev))
    rx2.load(str(tmp_path / "auto_fleet.npz"))
    for i, w in enumerate((fm_wire, am_wire)):
        rx2.push(i, w[cut:])
    rx2.flush()

    assert rx2.station_modes == [("fm", 1), ("am", False)]
    for i, want in enumerate(({bytes(p) for p in fm_packets},
                              {bytes(p) for p in am_packets})):
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want) >= 32, (i, len(hdc & want))


def test_heterogeneous_dict_locks(rng):
    """A single cold-start lock dict broadcasts to every station
    (advisor r4: it used to be silently DISCARDED, starting the fleet
    unlocked), matching MultiStationReceiver's contract."""
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.serve import HeterogeneousReceiver

    sig, packets = _station_stream(rng, "Dict Lock", n_frames=5)
    off = 23456
    shifted = sig[off:]
    rc = np.stack([shifted.real, -shifted.imag], -1).astype(np.float32)
    lock = rcc.cold_start_rc(rc)
    assert lock is not None and lock["psmi"] == 1

    events = {0: [], 1: []}
    rx = HeterogeneousReceiver(2, lambda st, ev: events[st].append(ev),
                               locks=lock, frames_per_dispatch=1)
    tail = shifted[lock["offset"]:]
    for lo in range(0, len(tail), 250000):
        for i in range(2):
            rx.push(i, tail[lo:lo + 250000])
    rx.flush()
    want = {bytes(p) for p in packets}
    for i in range(2):
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & want) >= 64, (i, len(hdc & want))


def test_heterogeneous_rtltcp_fleet_auto(rng):
    """Live-tuner fleet with serve-side mode discovery: one FM and one
    AM fake rtl_tcp server, ``modes="auto"`` — the fleet needs NO mode
    arguments (the reference's per-dongle contract, src/nrsc5.c:325-358)
    and each tuner's band + service mode is discovered from its own cu8
    stream, decoding both with no cross-station leakage."""
    import time

    from nrsc5_tpu.serve import RtlTcpFleet
    from nrsc5_tpu.tx import channel as ch

    from .test_rtltcp import FakeRtlTcp

    fm_sig, fm_packets = _station_stream(rng, "Auto Fleet FM",
                                         n_frames=4)
    am_sig, am_packets = _am_stream(rng, 10)
    up = ch.upsample_exact(am_sig, 32)
    servers = [
        FakeRtlTcp(ch.to_cu8(ch.upsample2(fm_sig)).tobytes()),
        FakeRtlTcp(ch.to_cu8(up * (0.4 / np.abs(up).max())).tobytes()),
    ]
    for s in servers:
        s.start()

    events = {0: [], 1: []}
    fleet = RtlTcpFleet(
        [("127.0.0.1", s.port) for s in servers],
        [88.5e6, 710e3],
        lambda st, ev: events[st].append(ev),
        gain_db=30.0, modes="auto", frames_per_dispatch=1)
    fleet.start()
    am_want = {bytes(p) for p in am_packets}
    try:
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            fm_ok = any(e.type == EventType.ID3
                        and e.title == "Auto Fleet FM"
                        for e in events[0])
            am_hdc = {e.data for e in events[1]
                      if e.type == EventType.HDC and not e.crc_error}
            if fm_ok and len(am_hdc & am_want) >= 32:
                break
            time.sleep(0.5)
    finally:
        fleet.stop()
        for s in servers:
            s.stop.set()

    assert fleet.rx.station_modes[0] == ("fm", 1)
    assert fleet.rx.station_modes[1] == ("am", False)
    fm_titles = {e.title for e in events[0] if e.type == EventType.ID3}
    assert "Auto Fleet FM" in fm_titles, fm_titles
    am_hdc = {e.data for e in events[1]
              if e.type == EventType.HDC and not e.crc_error}
    assert len(am_hdc & am_want) >= 32, len(am_hdc & am_want)
    fm_hdc = {e.data for e in events[0]
              if e.type == EventType.HDC and not e.crc_error}
    assert not (fm_hdc & am_want)  # no cross-band leakage


def test_heterogeneous_auto_discovery_ma3(rng):
    """Mixed-AM auto discovery: an MA1 and an MA3 (all-digital) station
    pushed as cu8 wire with NO mode arguments — the two AM service
    modes land in SEPARATE fused groups, keyed ("am", False) and
    ("am", True), each decoding bit-exact.  (The reference cannot even
    cold-start MA3 — test_reference_cannot_coldstart_ma3 — so this
    whole fleet shape has no reference equivalent.)"""
    from nrsc5_tpu.serve import HeterogeneousReceiver
    from nrsc5_tpu.tx import channel as ch

    from .capture_helpers import build_am_capture

    wires, wants = [], []
    for ma3 in (False, True):
        sig, packets = build_am_capture(rng, n_frames=10, ma3=ma3)
        up = ch.upsample_exact(
            np.concatenate([np.zeros(C.FFTCP_AM // 2, np.complex64),
                            sig]), 32)
        wires.append(ch.to_cu8(up * (0.4 / np.abs(up).max())).tobytes())
        wants.append({bytes(b) for _, pk in packets for b in pk})

    events = {0: [], 1: []}
    rx = HeterogeneousReceiver(2, lambda st, ev: events[st].append(ev),
                               cold_start=True, input_format="cu8",
                               frames_per_dispatch=2)
    chunk = 2 * 1000 * 1000
    n = max(len(w) for w in wires)
    for lo in range(0, n, chunk):
        for i in range(2):
            rx.push(i, wires[i][lo:lo + chunk])
    rx.flush()

    assert rx.station_modes == [("am", False), ("am", True)], \
        rx.station_modes
    assert len(rx._groups) == 2  # one fused program per AM mode
    for i in range(2):
        kinds = [e.type for e in events[i]]
        assert kinds.count(EventType.SYNC) == 1, (i, kinds)
        hdc = {e.data for e in events[i]
               if e.type == EventType.HDC and not e.crc_error}
        assert len(hdc & wants[i]) >= 32, (i, len(hdc & wants[i]))
        assert not (hdc & wants[1 - i] - wants[i]), i


def test_heterogeneous_auto_quiesce_undiscovered(rng):
    """A dead tuner whose mode was never discovered: quiesce() stops
    the mode probing (no further cold-start probes burn on its
    silence) while the other station discovers and decodes normally —
    the RtlTcpFleet dead-tuner contract on the auto-discovery path."""
    from nrsc5_tpu.serve import HeterogeneousReceiver
    from nrsc5_tpu.tx import channel as ch

    sig, packets = _station_stream(rng, "Quiesce Live", n_frames=4)
    wire = ch.to_cu8(ch.upsample2(sig)).tobytes()
    noise = rng.integers(96, 160, (len(wire) // 2, 2)) \
        .astype(np.uint8).tobytes()

    events = {0: [], 1: []}
    rx = HeterogeneousReceiver(2, lambda st, ev: events[st].append(ev),
                               cold_start=True, input_format="cu8",
                               frames_per_dispatch=1)
    chunk = 2 * 1000 * 1000
    rx.push(0, wire[:chunk])
    rx.push(1, noise[:chunk])
    rx.quiesce(1)  # reader thread declared the tuner dead
    before = rx._probe_next[1]
    assert before == float("inf")
    for lo in range(chunk, len(wire), chunk):
        rx.push(0, wire[lo:lo + chunk])
        rx.push(1, noise[lo:lo + chunk])
    rx.flush()

    assert rx.station_modes[0] == ("fm", 1)
    assert rx.station_modes[1] is None  # never discovered, never probed
    assert rx._probe_next[1] == float("inf")
    assert rx.queue_depth(1) > 0  # staged silence, bounded by the caller
    hdc = {e.data for e in events[0]
           if e.type == EventType.HDC and not e.crc_error}
    assert len(hdc & {bytes(p) for p in packets}) >= 64
    assert not events[1] or all(
        e.type != EventType.SYNC for e in events[1])
