"""Golden cross-check against the ACTUAL reference receiver binary.

Builds /root/reference's libnrsc5.so out-of-tree (support/refbuild — stub
fftw3f/librtlsdr, FAAD2 off so HDC packets are the output boundary), drives
it through the reference's own ctypes binding on a capture produced by this
framework's truth harness, and asserts the reference and this framework
decode IDENTICAL transport output (ID3 title, LOT file, bit-exact HDC
packet set).

This closes the loop left by the missing support/sample.xz blob: our
decoder is tested against our encoder everywhere else; here the reference
decoder independently validates that encoder (and, transitively, the whole
bit-exact chain).  Reference CI analog: .github/workflows/ci.yml:30-42.

Skips cleanly when /root/reference or a C toolchain is absent.
"""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("NRSC5_REFERENCE_DIR", "/root/reference")


def _build_reference_lib():
    sys.path.insert(0, REPO)
    from support.refbuild.build import build

    return build()


@pytest.fixture(scope="module")
def reference_nrsc5():
    """The reference's ctypes binding bound to the freshly built library."""
    lib = _build_reference_lib()
    if lib is None:
        pytest.skip("reference tree or toolchain unavailable")
    binding_path = os.path.join(REFERENCE, "support", "nrsc5.py")
    if not os.path.exists(binding_path):
        pytest.skip("reference ctypes binding unavailable")
    spec = importlib.util.spec_from_file_location("reference_nrsc5_binding",
                                                  binding_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import ctypes

    mod.NRSC5.libnrsc5 = ctypes.cdll.LoadLibrary(lib)
    return mod


@pytest.fixture(scope="module")
def golden_capture(tmp_path_factory):
    out = tmp_path_factory.mktemp("xcheck") / "sample.cu8"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "support", "make_capture.py"),
                    str(out)], check=True, env=env, timeout=600)
    return np.fromfile(out, np.uint8)


def _decode_with_reference(mod, cu8: np.ndarray):
    events = []
    radio = mod.NRSC5(lambda evt_type, evt: events.append((evt_type, evt)))
    radio.open_pipe()
    data = cu8.tobytes()
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cu8(data[i:i + 131072])
    radio.close()
    return events


def _decode_with_framework(cu8: np.ndarray):
    from nrsc5_tpu.api.session import MODE_FM, NRSC5

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_FM)
    for i in range(0, len(cu8), 131072):
        radio.pipe_samples_cu8(cu8[i:i + 131072])
    return events


def test_reference_and_framework_agree(reference_nrsc5, golden_capture):
    mod = reference_nrsc5
    ref_events = _decode_with_reference(mod, golden_capture)

    ET = mod.EventType
    ref_kinds = {t for t, _ in ref_events}
    assert ET.SYNC in ref_kinds, "reference build failed to sync on our capture"

    ref_titles = {e.title for t, e in ref_events if t == ET.ID3 and e.title}
    assert "You're Listening to TPU" in ref_titles, ref_titles

    ref_lots = {(e.name, bytes(e.data)) for t, e in ref_events if t == ET.LOT}
    assert ("tpu.png", bytes(range(100))) in ref_lots

    ref_hdc = {bytes(e.data) for t, e in ref_events
               if t == ET.HDC and e.program == 0
               and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    assert len(ref_hdc) >= 64, f"reference decoded only {len(ref_hdc)} packets"

    from nrsc5_tpu.api.events import EventType as OurET

    our_events = _decode_with_framework(golden_capture)
    our_titles = {e.title for e in our_events if e.type == OurET.ID3}
    assert "You're Listening to TPU" in our_titles

    our_hdc = {e.data for e in our_events
               if e.type == OurET.HDC and not e.crc_error and e.program == 0}

    # The two receivers sync at slightly different points, so compare the
    # intersection-coverage both ways: every packet the reference decoded
    # must be bit-identical to one of ours, and vice versa (minus edge
    # frames where one chain locked a frame earlier than the other).
    only_ref = ref_hdc - our_hdc
    only_ours = our_hdc - ref_hdc
    both = ref_hdc & our_hdc
    assert len(both) >= 64, (len(both), len(only_ref), len(only_ours))
    # Edge tolerance: at most one frame (32 packets) of one-sided decode.
    assert len(only_ref) <= 32, f"{len(only_ref)} packets only in reference"
    assert len(only_ours) <= 32, f"{len(only_ours)} packets only in framework"

    our_lots = {(e.name, bytes(e.data)) for e in our_events
                if e.type == OurET.LOT}
    assert ("tpu.png", bytes(range(100))) in our_lots


def _reference_decode_am(mod, sig):
    from .capture_helpers import complex_to_cs16

    data = complex_to_cs16(sig)
    events = []
    radio = mod.NRSC5(lambda t, e: events.append((t, e)))
    radio.open_pipe()
    radio.set_mode(mod.Mode.AM)
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cs16(data[i:i + 131072])
    radio.close()
    return events


def test_reference_agrees_am(reference_nrsc5):
    """AM (MA1) cross-check: the reference binary must decode the AM HDC
    packets our truth harness modulated, bit-exactly (cs16 @ 46.5 kS/s,
    reference path: src/input.c:119 -> sync_process_am -> decode ->
    frame_push P1_FRAME_LEN_AM), plus the SIS station name carried on the
    AM PIDS subcarriers (QAM16 -> K=9 unpunctured -> src/pids.c)."""
    mod = reference_nrsc5
    from nrsc5_tpu.tx import sis_encoder as SE

    from .capture_helpers import build_am_capture

    rng = np.random.default_rng(0x5EED)
    sig, packets = build_am_capture(
        rng, n_frames=7, ma3=False,
        sis_frames=[SE.short_name("KAMX-FM"), SE.station_id("US", 777)])
    events = _reference_decode_am(mod, sig)

    ET = mod.EventType
    assert ET.SYNC in {t for t, _ in events}, "reference failed AM sync"
    names = {e.name for t, e in events if t == ET.STATION_NAME}
    assert "KAMX-FM" in names, names
    ids = {(e.country_code, e.fcc_facility_id)
           for t, e in events if t == ET.STATION_ID}
    assert ("US", 777) in ids, ids
    ref_hdc = {bytes(e.data) for t, e in events
               if t == ET.HDC and e.program == 0
               and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    # frame 4 decodes fully (0-3 are diversity warm-up; the capture tail
    # after frame 5 is cut off by stream end — the reference has no flush)
    want = {p for f, pk in packets if f == 4 for p in pk}
    got = sum(p in ref_hdc for p in want)
    assert got == len(want), f"{got}/{len(want)} AM packets in reference"


def test_reference_cannot_coldstart_ma3(reference_nrsc5):
    """Documented capability asymmetry: the reference CANNOT cold-start
    acquire an MA3 (all-digital AM) signal.  Its pre-sync band filter
    (src/acquire.c:63-96, applied at src/acquire.c:125 before the CP
    correlation) passes only ~bins 53-90 — the MA1 outer primary
    partitions — rejecting the rest of the band by >60 dB.  MA3 puts its
    primaries at the inner bins (2-26) and nothing above bin 53, so the
    correlator sees no signal and sync never occurs.  This framework's
    full-band acquisition cold-starts the same capture and decodes it
    bit-exactly (tests/test_session.py::test_am_session_transport[True]).
    If the upstream filter is ever fixed, this test flips and the MA1
    assertions above should be extended to MA3."""
    mod = reference_nrsc5
    from .capture_helpers import build_am_capture

    rng = np.random.default_rng(0x5EED)
    sig, _ = build_am_capture(rng, n_frames=7, ma3=True)
    events = _reference_decode_am(mod, sig)
    assert mod.EventType.SYNC not in {t for t, _ in events}, \
        "upstream MA3 cold-start now works — extend the MA1 cross-check"


def test_sensitivity_parity_with_reference(reference_nrsc5):
    """At the decode cliff (-4 dB) and in the clear (12 dB), the framework
    must recover at least as many ground-truth packets as the reference
    binary from the IDENTICAL impaired cu8 capture (measured sweep in
    support/ref_sensitivity.py: both plateau at 70/96 down to -4 dB and
    collapse together at -6 dB)."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    from support.ref_sensitivity import (build_capture, decode_framework,
                                         decode_reference)

    for snr, floor in ((12.0, 69), (-4.0, 60)):
        rng = np.random.default_rng(0xBE12)
        cu8, packets = build_capture(rng, 3, snr)
        want = set(packets)
        ours = decode_framework(cu8) & want
        ref = decode_reference(mod, cu8) & want
        assert len(ours) >= len(ref), (snr, len(ours), len(ref))
        assert len(ours) >= floor, (snr, len(ours))


def test_reference_decodes_our_sis(reference_nrsc5):
    """The reference binary must decode the full SIS schedule produced by
    tx/sis_encoder from a modulated capture: station id, short name,
    slogan, location, message, audio service, local time
    (reference decoder: src/pids.c:394-754)."""
    mod = reference_nrsc5
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx import sis_encoder as SE
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame

    from .capture_helpers import fm_capture_cu8

    rng = np.random.default_rng(7)
    schedule = ([SE.station_id("US", 12345), SE.short_name("KTPU-FM")]
                + SE.long_name("TPU Public Radio")
                + SE.location(37.4042, -122.0756, 32)
                + SE.message("Hello from the TPU framework")
                + [SE.audio_service(0, access=0, type_=1, sound_exp=2),
                   SE.local_time(-480, dst_sched=1, dst_local=True)]
                + SE.emergency_alert("TORNADO WARNING THIS IS A TEST",
                                     category1=2, category2=3,
                                     location_format=0,
                                     locations=[29037, 29095]))
    n_frames = 3
    packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
               for _ in range(32)]
    mats, k = [], 0

    def pids16():
        nonlocal k
        rows = np.stack([schedule[(k + i) % len(schedule)] for i in range(16)])
        k += 16
        return rows

    for f in range(n_frames):
        mats.append(build_pm_matrix(
            build_p1_fm_frame(packets, 0, f % 8, (f * 32) % 64), pids16()))
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids16())
    cu8 = fm_capture_cu8(mats, dummy, rng)

    events = _decode_with_reference(mod, cu8)
    by_type = {}
    for t, e in events:
        by_type.setdefault(t, []).append(e)
    ET = mod.EventType

    ids = {(e.country_code, e.fcc_facility_id)
           for e in by_type.get(ET.STATION_ID, [])}
    assert ("US", 12345) in ids, by_type.keys()
    assert "KTPU-FM" in {e.name for e in by_type.get(ET.STATION_NAME, [])}
    assert "TPU Public Radio" in \
        {e.slogan for e in by_type.get(ET.STATION_SLOGAN, [])}
    locs = by_type.get(ET.STATION_LOCATION, [])
    assert any(abs(e.latitude - 37.4042) < 1e-3
               and abs(e.longitude + 122.0756) < 1e-3
               and e.altitude == 32 for e in locs), locs
    assert "Hello from the TPU framework" in \
        {e.message for e in by_type.get(ET.STATION_MESSAGE, [])}
    aud = by_type.get(ET.AUDIO_SERVICE_DESCRIPTOR, [])
    assert any(e.program == 0 and e.type.value == 1 and e.sound_exp == 2
               for e in aud), aud
    lt = by_type.get(ET.LOCAL_TIME, [])
    assert any(e.utc_offset == -480 and e.dst_local for e in lt), lt
    alerts = by_type.get(ET.EMERGENCY_ALERT, [])
    assert any(e.message == "TORNADO WARNING THIS IS A TEST"
               and [c.value for c in e.categories] == [2, 3]
               and e.location_format is not None
               and e.location_format.value == 0
               and list(e.locations) == [29037, 29095]
               for e in alerts), alerts


def test_reference_agrees_mp3_px1(reference_nrsc5):
    """MP3 service mode cross-check: the reference binary must decode the
    program-1 (SPS) audio packets our harness carried over the PX1
    interleaver-IV channel — this pins the interleaver-IV two-frame delay
    semantics against the real implementation (reference:
    src/decode.c:344-437, src/sync.c:537-595)."""
    mod = reference_nrsc5
    from .capture_helpers import build_fm_mp3_capture, complex_to_cs16

    rng = np.random.default_rng(0x5EED)
    sig, p3_packets = build_fm_mp3_capture(rng, n_cycles=2)
    data = complex_to_cs16(sig)

    events = []
    radio = mod.NRSC5(lambda t, e: events.append((t, e)))
    radio.open_pipe()
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cs16(data[i:i + 131072])
    radio.close()

    ET = mod.EventType
    syncs = [e for t, e in events if t == ET.SYNC]
    assert syncs and any(s.psmi == 3 for s in syncs), \
        f"reference did not report MP3 (psmi) sync: {syncs}"
    ref_p1 = {bytes(e.data) for t, e in events
              if t == ET.HDC and e.program == 0
              and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    assert len(ref_p1) >= 64, "reference lost the P1 program"
    ref_p3 = {bytes(e.data) for t, e in events
              if t == ET.HDC and e.program == 1
              and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    cyc1 = {p for cyc, pkts in p3_packets if cyc == 1 for p in pkts}
    matches = len(ref_p3 & cyc1)
    assert matches > 0, \
        f"reference decoded no cycle-1 P3 packet ({len(ref_p3)} p3 events)"


def test_reference_agrees_here_image(reference_nrsc5):
    """HERE image cross-check: a SIG stream component (MIME HERE_IMAGE) +
    0xFFF7FFF7-framed tile packets on its port; the reference binary and
    this framework must both reassemble the identical image (reference:
    src/here_images.c, src/output.c:701-709)."""
    mod = reference_nrsc5
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

    from .capture_helpers import fm_capture_cu8, here_packet

    PORT = 0x1002
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, 120).astype(np.uint8).tobytes()

    sig_table = bytearray()
    sig_table += bytes([0x41, 0x01, 0x00, 0x00])  # data service #1
    name = b"\x00HERE"
    sig_table += bytes([0x69, 1 + len(name)]) + name
    comp = bytes([0x00, PORT & 0xFF, PORT >> 8, 0x00, 0x00,
                  0,  # AASType.STREAM
                  0, 0]) + (0xB7F03DFC).to_bytes(4, "little")
    sig_table += bytes([0x67, 1 + len(comp)]) + comp

    pkt = here_packet(8, 3, 777001, "t3.png", img)
    psd = [aas_frame(0x20, 0, bytes(sig_table)),
           aas_frame(PORT, 1, pkt[:100]),
           aas_frame(PORT, 2, pkt[100:])]

    packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
               for _ in range(32)]
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(
        build_p1_fm_frame(packets, 0, f % 8, (f * 32) % 64, psd=psd[f]),
        pids) for f in range(3)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    cu8 = fm_capture_cu8(mats, dummy, rng)

    ET = mod.EventType
    ref_events = _decode_with_reference(mod, cu8)
    ref_imgs = [e for t, e in ref_events if t == ET.HERE_IMAGE]
    assert any(e.image_type.value == 8 and e.n1 == 3
               and e.name == "t3.png"
               and bytes(e.data) == img for e in ref_imgs), ref_imgs

    from nrsc5_tpu.api.events import EventType as OurET

    our_events = _decode_with_framework(cu8)
    our_imgs = [e for e in our_events if e.type == OurET.HERE_IMAGE]
    assert any(e.image_type == 8 and e.n1 == 3 and e.timestamp == 777001
               and e.name == "t3.png" and e.data == img
               for e in our_imgs), our_imgs


def test_reference_agrees_id3_fields(reference_nrsc5):
    """Rich-PSD cross-check: TIT2/TPE1/TALB/TCON/UFID/XHDR must decode
    identically in the reference binary and this framework (reference
    ID3 parse: src/output.c:248-491)."""
    mod = reference_nrsc5
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

    from .capture_helpers import fm_capture_cu8, id3_tag

    rng = np.random.default_rng(23)
    tag = id3_tag(title="Song Of The TPU", artist="The Systolics",
                  album="Matrix Unit", genre="Electronic",
                  ufid=("tpu.example", "trk-42"),
                  xhdr=(0x4F328CA0, 0, (1234).to_bytes(2, "little")),
                  comment=("eng", "n", "live set"))
    psd = aas_frame(0x5100, 0, tag)
    # 16 packets: shrinks the location table so the rich tag fits the
    # la_location byte budget
    packets = [rng.integers(0, 256, 600).astype(np.uint8).tobytes()
               for _ in range(16)]
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(
        build_p1_fm_frame(packets, 0, f % 8, (f * 32) % 64, psd=psd),
        pids) for f in range(3)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    cu8 = fm_capture_cu8(mats, dummy, rng)

    ET = mod.EventType
    ref = [e for t, e in _decode_with_reference(mod, cu8) if t == ET.ID3]
    assert any(e.title == "Song Of The TPU" and e.artist == "The Systolics"
               and e.album == "Matrix Unit" and e.genre == "Electronic"
               and e.ufid == mod.UFID("tpu.example", "trk-42")
               and e.xhdr is not None and e.xhdr.param == 0
               and e.xhdr.lot == 1234
               and any(c.lang == "eng" and c.short_content_desc == "n"
                       and c.full_text == "live set"
                       for c in e.comments)
               for e in ref), ref

    from nrsc5_tpu.api.events import EventType as OurET

    ours = [e for e in _decode_with_framework(cu8) if e.type == OurET.ID3]
    assert any(e.title == "Song Of The TPU" and e.artist == "The Systolics"
               and e.album == "Matrix Unit" and e.genre == "Electronic"
               and e.ufid_owner == "tpu.example" and e.ufid_id == "trk-42"
               and e.xhdr_param == 0 and e.xhdr_lot == 1234
               and any(c["lang"] == "eng" and c["short_content_desc"] == "n"
                       and c["full_text"] == "live set"
                       for c in e.comments)
               for e in ours), ours


def test_reference_agrees_multifragment_lot(reference_nrsc5):
    """LOT reassembly cross-check over 3 fragments (256+256+88 bytes,
    metadata on fragment 0, fragments delivered out of order): both
    receivers must emit the identical complete file (reference:
    src/output.c:627-872)."""
    mod = reference_nrsc5
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

    from .capture_helpers import fm_capture_cu8

    PORT = 0x1003
    LOT_ID = 21
    rng = np.random.default_rng(31)
    blob = rng.integers(0, 256, 600).astype(np.uint8).tobytes()

    sig_table = bytearray()
    sig_table += bytes([0x41, 0x01, 0x00, 0x00])
    name = b"\x00Files"
    sig_table += bytes([0x69, 1 + len(name)]) + name
    comp = bytes([0x00, PORT & 0xFF, PORT >> 8, 0x00, 0x00,
                  3,  # AASType.LOT
                  0, 0]) + (0x4F328CA0).to_bytes(4, "little")
    sig_table += bytes([0x67, 1 + len(comp)]) + comp

    meta = bytearray(16)
    meta[0:4] = (1).to_bytes(4, "little")
    year, mon, mday, hour, minute = 2027, 1, 2, 3, 4
    meta[4] = ((hour & 0x3) << 6) | minute
    meta[5] = (mday << 3) | (hour >> 2)
    meta[6] = ((year & 0xF) << 4) | mon
    meta[7] = year >> 4
    meta[8:12] = len(blob).to_bytes(4, "little")
    meta[12:16] = (0x4F328CA0).to_bytes(4, "little")
    meta += b"big.png"

    def fragment(seq: int, payload: bytes, with_meta: bool) -> bytes:
        hdr = bytearray([8 + (len(meta) if with_meta else 0), 0,
                         LOT_ID & 0xFF, LOT_ID >> 8])
        hdr += seq.to_bytes(4, "little")
        return bytes(hdr) + (bytes(meta) if with_meta else b"") + payload

    frags = [fragment(0, blob[:256], True),
             fragment(1, blob[256:512], False),
             fragment(2, blob[512:], False)]
    # out of order (1, 0, 2) and streamed as one HDLC byte stream sliced
    # across 4 consecutive PDUs' PSD regions — HDLC frames legitimately
    # span PDU boundaries (stateful parse, reference: src/frame.c:328-391)
    stream = (aas_frame(0x20, 0, bytes(sig_table))
              + aas_frame(PORT, 1, frags[1]) + aas_frame(PORT, 2, frags[0])
              + aas_frame(PORT, 3, frags[2]))
    step = 170  # la_location budget: 15-byte header + 32x16-bit locations
    n_frames = (len(stream) + step - 1) // step
    psd = [stream[i * step:(i + 1) * step] for i in range(n_frames)]

    packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
               for _ in range(32)]
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(
        build_p1_fm_frame(packets, 0, f % 8, (f * 32) % 64, psd=psd[f]),
        pids) for f in range(n_frames)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    cu8 = fm_capture_cu8(mats, dummy, rng)

    ET = mod.EventType
    ref_lots = [(e.name, bytes(e.data), e.lot)
                for t, e in _decode_with_reference(mod, cu8) if t == ET.LOT]
    assert ("big.png", blob, LOT_ID) in ref_lots, \
        [(n, len(d), l) for n, d, l in ref_lots]

    from nrsc5_tpu.api.events import EventType as OurET

    our_lots = [(e.name, e.data, e.lot)
                for e in _decode_with_framework(cu8) if e.type == OurET.LOT]
    assert ("big.png", blob, LOT_ID) in our_lots, \
        [(n, len(d), l) for n, d, l in our_lots]


def test_reference_agrees_fixed_subchannel(reference_nrsc5):
    """Fixed data subchannel cross-check: P1 frames with the AUDIO+FIXED
    PCI carry a CCC-configured subchannel whose BBM blocks convey an AAS
    ID3 frame; the reference binary must detect the sync width, parse the
    CCC, reassemble the BBM block, and report the same ID3 (reference:
    src/frame.c:393-514)."""
    mod = reference_nrsc5
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.transport.frame import BBM_MAGIC
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import (aas_frame, build_audio_pdu,
                                                hdlc_escape, pack_frame)
    from nrsc5_tpu.utils.crc import fcs16_append

    from .capture_helpers import fm_capture_cu8

    SYNC_BYTE, SYNC_WIDTH, SUB_LEN = 0xFF, 30, 64
    rng = np.random.default_rng(41)

    payload = bytearray([0x00])
    for i in range(4):
        length = SUB_LEN if i == 0 else 0
        payload += bytes([0, 0, length & 0xFF, length >> 8])
    ccc = b"\x7e" + hdlc_escape(fcs16_append(bytes(payload))) + b"\x7e"

    def fixed_tail(sub_chunk: bytes) -> bytes:
        return sub_chunk + ccc.ljust(SYNC_WIDTH, b"\x7e") + bytes([SYNC_BYTE])

    tit2 = b"TIT2" + (9).to_bytes(4, "big") + b"\x00\x00" + b"\x00FixedSub"
    inner = aas_frame(0x5100, 1, b"ID3\x03\x00\x00"
                      + bytes([0, 0, 0, len(tit2)]) + tit2)
    block = BBM_MAGIC + inner.ljust(255, b"\x7e")
    stream = block + bytes([0x7E]) * (5 * SUB_LEN - len(block))
    sub_chunks = [stream[i * SUB_LEN:(i + 1) * SUB_LEN] for i in range(5)]

    pkts = [rng.integers(0, 256, 200).astype(np.uint8).tobytes()
            for _ in range(2)]
    total = C.MAX_PDU_LEN - len(fixed_tail(sub_chunks[0]))

    n_frames = 8
    mats = []
    pids = np.zeros((16, 80), np.uint8)
    for f in range(n_frames):
        sub = sub_chunks[min(max(f - 3, 0), 4)] if f >= 3 else b"\x7e" * SUB_LEN
        pdu = build_audio_pdu(pkts, pdu_seq=f % 8, seq=(f * 32) % 64,
                              total_len=total)
        buf = pdu.tobytes() + fixed_tail(sub)
        bits = pack_frame(np.frombuffer(buf, np.uint8), C.P1_FRAME_LEN_FM,
                          C.PCI_AUDIO_FIXED)
        mats.append(build_pm_matrix(bits, pids))
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    cu8 = fm_capture_cu8(mats, dummy, rng)

    ET = mod.EventType
    ref_titles = {e.title for t, e in _decode_with_reference(mod, cu8)
                  if t == ET.ID3 and e.title}
    assert "FixedSub" in ref_titles, ref_titles

    from nrsc5_tpu.api.events import EventType as OurET

    our_titles = {e.title for e in _decode_with_framework(cu8)
                  if e.type == OurET.ID3}
    assert "FixedSub" in our_titles, our_titles


@pytest.mark.parametrize("cfo_hz", [3000.0, -5000.0])
def test_cfo_tolerance_parity(reference_nrsc5, cfo_hz):
    """Integer-CFO acquisition parity: at multi-bin carrier offsets both
    receivers recover the same packet count from the identical capture
    (our ops/detect_cfo.py vs the reference's +-38-bin search,
    src/sync.c:292-337; measured identical at +-1/3/5/8 kHz)."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    from support.ref_sensitivity import (build_capture, decode_framework,
                                         decode_reference)

    rng = np.random.default_rng(0xBE12)
    import nrsc5_tpu.tx.channel as ch

    orig = ch.impair

    def impair_cfo(sig, sample_offset=0, **kw):
        kw["cfo_hz"] = cfo_hz
        return orig(sig, sample_offset=sample_offset, **kw)

    ch.impair, saved = impair_cfo, orig
    try:
        cu8, packets = build_capture(rng, 3, 25.0)
    finally:
        ch.impair = saved
    want = set(packets)
    ours = decode_framework(cu8) & want
    ref = decode_reference(mod, cu8) & want
    assert len(ours) >= len(ref) >= 64, (cfo_hz, len(ours), len(ref))


def test_clock_drift_parity(reference_nrsc5):
    """Sample-clock drift tracking parity: both receivers fully track
    +-50 ppm and degrade identically at +100 ppm (the samperr feedback
    loop; reference: src/sync.c:426-463 -> src/acquire.c:110-119)."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    import nrsc5_tpu.tx.channel as ch
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame
    from support.ref_sensitivity import decode_framework, decode_reference

    from .capture_helpers import fm_capture_cu8

    for ppm, floor in ((50.0, 100), (100.0, 60)):
        rng = np.random.default_rng(0xBE12)
        all_packets, mats = [], []
        pids = np.zeros((16, 80), np.uint8)
        for f in range(4):
            pk = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                  for _ in range(32)]
            all_packets.extend(pk)
            mats.append(build_pm_matrix(
                build_p1_fm_frame(pk, 0, f % 8, (f * 32) % 64), pids))
        dummy = build_pm_matrix(
            rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)

        orig = ch.impair

        def impair_drift(sig, **kw):
            return orig(ch.clock_drift(sig, ppm), **kw)

        ch.impair = impair_drift
        try:
            cu8 = fm_capture_cu8(mats, dummy, rng)
        finally:
            ch.impair = orig
        want = set(all_packets)
        ours = decode_framework(cu8) & want
        ref = decode_reference(mod, cu8) & want
        assert len(ours) >= len(ref) >= floor, (ppm, len(ours), len(ref))


def test_multipath_parity(reference_nrsc5):
    """Static 2-ray multipath (echo 7 samples @ 0.8, 30 @ 0.5): both
    equalizers fully recover the same packets (ours interpolates the
    adjacent reference subcarriers like the reference's
    src/sync.c:254-282; measured identical across delay/amp grid)."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    import nrsc5_tpu.tx.channel as ch
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame
    from support.ref_sensitivity import decode_framework, decode_reference

    from .capture_helpers import fm_capture_cu8

    for delay, amp in ((7, 0.8), (30, 0.5)):
        rng = np.random.default_rng(0xBE12)
        all_packets, mats = [], []
        pids = np.zeros((16, 80), np.uint8)
        for f in range(3):
            pk = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                  for _ in range(32)]
            all_packets.extend(pk)
            mats.append(build_pm_matrix(
                build_p1_fm_frame(pk, 0, f % 8, (f * 32) % 64), pids))
        dummy = build_pm_matrix(
            rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)

        orig = ch.impair

        def impair_mp(sig, **kw):
            return orig(ch.multipath(sig, delay, amp), **kw)

        ch.impair = impair_mp
        try:
            cu8 = fm_capture_cu8(mats, dummy, rng)
        finally:
            ch.impair = orig
        want = set(all_packets)
        ours = decode_framework(cu8) & want
        ref = decode_reference(mod, cu8) & want
        assert len(ours) >= len(ref) >= 64, (delay, amp, len(ours), len(ref))


def test_reference_agrees_two_programs(reference_nrsc5):
    """Multi-program parity: two audio programs as two PDUs in one P1
    frame (HEF program numbers) must decode to the same per-program
    bit-exact HDC packet sets in the reference binary and here
    (reference path: src/frame.c:198-265 HEF + per-program elastic,
    src/output.c per-program codecs)."""
    from .capture_helpers import fm_capture_cu8

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder
    from nrsc5_tpu.tx.transport_encoder import build_audio_pdu, pack_frame

    rng = np.random.default_rng(77)
    n_frames = 3
    sr = 44100
    t = np.arange(n_frames * 32 * 2048) / sr
    pk = []
    for f0 in (440.0, 660.0):
        enc = HDCEncoder(2)
        x = 0.3 * np.sin(2 * np.pi * f0 * t)
        stereo = np.stack([x, x], axis=-1)
        pk.append([enc.encode_frame(stereo[i * 2048:(i + 1) * 2048])
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
    cu8 = fm_capture_cu8(mats, dummy, rng)

    mod = reference_nrsc5
    ref_events = _decode_with_reference(mod, np.frombuffer(cu8, np.uint8))
    ET = mod.EventType
    our_events = _decode_with_framework(np.frombuffer(cu8, np.uint8))
    from nrsc5_tpu.api.events import EventType as OurET

    for p in (0, 1):
        want = {bytes(q) for q in pk[p]}
        ref_hdc = {bytes(e.data) for et, e in ref_events
                   if et == ET.HDC and e.program == p
                   and not (e.flags & mod.PacketFlags.CRC_ERROR)}
        our_hdc = {e.data for e in our_events
                   if e.type == OurET.HDC and e.program == p
                   and not e.crc_error}
        assert len(ref_hdc & want) >= 48, \
            f"program {p}: reference decoded {len(ref_hdc & want)}"
        assert len(our_hdc & want) >= 48, \
            f"program {p}: framework decoded {len(our_hdc & want)}"
        both = ref_hdc & our_hdc
        assert len(both) >= 48, (p, len(both))
        assert len(ref_hdc - our_hdc) <= 32 and len(our_hdc - ref_hdc) <= 32


def test_combined_impairments_parity(reference_nrsc5):
    """Torture parity: multipath + sample-clock drift + multi-bin CFO +
    noise applied together (the realistic mobile-reception case — every
    tracking loop active at once).  Both receivers must recover the
    stream, and this framework must not trail the reference."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    import nrsc5_tpu.tx.channel as ch
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame
    from support.ref_sensitivity import decode_framework, decode_reference

    from .capture_helpers import fm_capture_cu8

    rng = np.random.default_rng(0xBE12)
    all_packets, mats = [], []
    pids = np.zeros((16, 80), np.uint8)
    for f in range(4):
        pk = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
              for _ in range(32)]
        all_packets.extend(pk)
        mats.append(build_pm_matrix(
            build_p1_fm_frame(pk, 0, f % 8, (f * 32) % 64), pids))
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)

    orig = ch.impair

    def impair_all(sig, sample_offset=0, **kw):
        sig = ch.multipath(sig, 25, 0.4)
        sig = ch.clock_drift(sig, 30.0)
        kw["cfo_hz"] = 4000.0
        kw["snr_db"] = 18.0
        return orig(sig, sample_offset=sample_offset, **kw)

    ch.impair = impair_all
    try:
        cu8 = fm_capture_cu8(mats, dummy, rng)
    finally:
        ch.impair = orig
    want = set(all_packets)
    ours = decode_framework(cu8) & want
    ref = decode_reference(mod, cu8) & want
    assert len(ours) >= len(ref) >= 64, (len(ours), len(ref))


def test_reference_agrees_mp11_px1_px2(reference_nrsc5):
    """MP11 service mode (widest FM mode) cross-check: program-1 audio
    over PX1 (P3) and program-2 audio over PX2 (P4) — pins the PX2
    slicing geometry and the P4 interleaver-IV semantics against the
    real implementation (reference: src/sync.c:581-605,
    src/decode.c:416-437), on both receivers from one capture."""
    mod = reference_nrsc5
    from .capture_helpers import build_fm_mp11_capture, complex_to_cs16

    rng = np.random.default_rng(0xE1EC7)
    sig, p3_packets, p4_packets = build_fm_mp11_capture(rng, n_cycles=2)
    data = complex_to_cs16(sig)

    events = []
    radio = mod.NRSC5(lambda t, e: events.append((t, e)))
    radio.open_pipe()
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cs16(data[i:i + 131072])
    radio.close()

    ET = mod.EventType
    syncs = [e for t, e in events if t == ET.SYNC]
    assert syncs and any(s.psmi == 11 for s in syncs), \
        f"reference did not report MP11 (psmi) sync: {syncs}"

    def ref_prog(p):
        return {bytes(e.data) for t, e in events
                if t == ET.HDC and e.program == p
                and not (e.flags & mod.PacketFlags.CRC_ERROR)}

    assert len(ref_prog(0)) >= 64, "reference lost the P1 program"
    cyc1_p3 = {p for cyc, pkts in p3_packets if cyc == 1 for p in pkts}
    cyc1_p4 = {p for cyc, pkts in p4_packets if cyc == 1 for p in pkts}
    # codec-mode-13 cadence keeps the elastic buffer aligned: the whole
    # delayed cycle surfaces (measured 62/64 ref, 64/64 framework)
    assert len(ref_prog(1) & cyc1_p3) >= 56, len(ref_prog(1) & cyc1_p3)
    assert len(ref_prog(2) & cyc1_p4) >= 56, len(ref_prog(2) & cyc1_p4)

    # the framework must decode the same capture's PX1+PX2 programs
    from nrsc5_tpu.api.events import EventType as OurET
    from nrsc5_tpu.api.session import MODE_FM, NRSC5

    our_events = []
    our = NRSC5.open_pipe(our_events.append, MODE_FM)
    cs16 = np.frombuffer(data, np.int16).reshape(-1, 2)
    csig = (cs16[:, 0] + 1j * cs16[:, 1]).astype(np.complex64) / 32767.0
    for i in range(0, len(csig), 131072):
        our.pipe_samples_cs16(csig[i:i + 131072])
    our.flush()

    def our_prog(p):
        return {bytes(e.data) for e in our_events
                if e.type == OurET.HDC and not e.crc_error
                and e.program == p}

    got_p3 = our_prog(1) & cyc1_p3
    got_p4 = our_prog(2) & cyc1_p4
    assert len(got_p3) >= 60, f"framework PX1: {len(got_p3)}/64"
    assert len(got_p4) >= 60, f"framework PX2: {len(got_p4)}/64"
    # every emitted packet (both receivers) is a transmitted one,
    # bit-exact — nothing invented, nothing corrupted
    sent_p3 = {p for c, pk in p3_packets for p in pk}
    sent_p4 = {p for c, pk in p4_packets for p in pk}
    assert our_prog(1) <= sent_p3 and our_prog(2) <= sent_p4
    assert ref_prog(1) <= sent_p3 and ref_prog(2) <= sent_p4


def test_reference_agrees_mp2_px1(reference_nrsc5):
    """MP2 service mode cross-check: one extended partition per
    sideband, 2304-bit P3 frames — the narrowest PX geometry
    (reference: src/sync.c:537-560 cm=2, src/frame.c MP2 2304b)."""
    mod = reference_nrsc5
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_pm_matrix, build_px_stream
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import (build_audio_pdu,
                                                build_p1_fm_frame,
                                                pack_frame)
    from .capture_helpers import complex_to_cs16
    from nrsc5_tpu import constants as C

    rng = np.random.default_rng(0x3B2)
    psmi, fl, n_cycles = 2, C.P3_FRAME_LEN_MP2, 2
    px_bytes = (fl - 24) // 8  # 285

    p3_packets = []
    p3_bits = np.zeros((n_cycles, 16, fl), np.uint8)
    for cyc in range(n_cycles):
        for f in range(16):
            pkts = [rng.integers(0, 256, 56).astype(np.uint8).tobytes()
                    for _ in range(4)]
            p3_packets.append((cyc, pkts))
            g = cyc * 16 + f
            pdu = build_audio_pdu(pkts, program=1, pdu_seq=g % 8,
                                  seq=(g * 4) % 64, codec_mode=13,
                                  total_len=px_bytes)
            p3_bits[cyc, f] = pack_frame(pdu, fl, C.PCI_AUDIO)
    sview = build_px_stream(p3_bits, fl) \
        .reshape(n_cycles * 32 * C.BLKSZ, -1)
    width = sview.shape[1]

    mats = []
    pids = np.zeros((16, 80), np.uint8)
    for f in range(2 * n_cycles):
        pkts = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                for _ in range(32)]
        p1 = build_p1_fm_frame(pkts, program=0, pdu_seq=f % 8,
                               seq=(f * 32) % 64)
        mats.append(build_pm_matrix(p1, pids))
    lead = 2
    dummy = mats[0]
    matrix = np.concatenate([dummy[(16 - lead) * 32:]] + mats
                            + [dummy[:2 * 32]])
    junk = rng.choice(np.array([-1, 1], np.int8), (lead * 32, width))
    trail = rng.choice(np.array([-1, 1], np.int8), (2 * 32, width))
    px_all = np.concatenate([junk, sview, trail])
    bc_seq = np.concatenate([np.arange(16 - lead, 16),
                             np.tile(np.arange(16), 2 * n_cycles),
                             np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px_all)
    sig = ch.impair(sig, snr_db=25.0, rng=rng)
    data = complex_to_cs16(sig)

    events = []
    radio = mod.NRSC5(lambda t, e: events.append((t, e)))
    radio.open_pipe()
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cs16(data[i:i + 131072])
    radio.close()
    ET = mod.EventType
    syncs = [e for t, e in events if t == ET.SYNC]
    assert syncs and any(s.psmi == 2 for s in syncs), \
        f"reference did not report MP2 sync: {syncs}"
    cyc1 = {p for cyc, pkts in p3_packets if cyc == 1 for p in pkts}
    ref_p3 = {bytes(e.data) for t, e in events
              if t == ET.HDC and e.program == 1
              and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    assert len(ref_p3 & cyc1) >= 56, len(ref_p3 & cyc1)

    from nrsc5_tpu.api.events import EventType as OurET
    from nrsc5_tpu.api.session import MODE_FM, NRSC5

    our_events = []
    our = NRSC5.open_pipe(our_events.append, MODE_FM)
    cs16 = np.frombuffer(data, np.int16).reshape(-1, 2)
    csig = (cs16[:, 0] + 1j * cs16[:, 1]).astype(np.complex64) / 32767.0
    for i in range(0, len(csig), 131072):
        our.pipe_samples_cs16(csig[i:i + 131072])
    our.flush()
    our_p3 = {bytes(e.data) for e in our_events
              if e.type == OurET.HDC and not e.crc_error
              and e.program == 1}
    assert len(our_p3 & cyc1) >= 60, f"framework MP2 PX1: {len(our_p3 & cyc1)}/64"
    sent = {p for c, pk in p3_packets for p in pk}
    assert our_p3 <= sent and ref_p3 <= sent


def test_multipath_sensitivity_beats_reference(reference_nrsc5):
    """Capability asymmetry in our favor (like MA3 cold start): under a
    deep static echo (0.9 amplitude — ~20 dB spectral nulls), the
    framework's per-bin channel-power LLR weighting
    (ops/sync_fm.EQ_MMSE: faded bins become near-erasures instead of
    the ZF demod's noise-amplified confident garbage) decodes ~5 dB
    deeper than the reference's unweighted demod (src/sync.c:504-507
    clamps every bin to the same per-sideband MER scale).  Measured at
    echo(30, 0.9): SNR 0 dB ours 70/96 vs reference 0/96; SNR 2 dB
    ours 70/96 vs reference 19/96.  Flat-channel parity is pinned by
    test_sensitivity_parity_with_reference."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    import nrsc5_tpu.tx.channel as ch
    from support.ref_sensitivity import (build_capture, decode_framework,
                                         decode_reference)

    orig = ch.impair
    for snr, ours_floor, ref_ceil in ((0.0, 60, 10), (2.0, 60, 45)):
        def impair_mp(sig, **kw):
            return orig(ch.multipath(sig, 30, 0.9), **kw)

        ch.impair = impair_mp
        try:
            rng = np.random.default_rng(0xD00D)
            cu8, packets = build_capture(rng, 3, snr)
        finally:
            ch.impair = orig
        want = {bytes(p) for p in packets}
        ours = decode_framework(cu8) & want
        ref = decode_reference(mod, cu8) & want
        assert len(ours) >= ours_floor, (snr, len(ours))
        assert len(ref) <= ref_ceil, \
            (snr, len(ref), "reference improved: retune the gap bound")
        assert len(ours) > len(ref) + 20, (snr, len(ours), len(ref))


def test_fading_parity(reference_nrsc5):
    """Two-tap Rayleigh fading (Jakes, 2 Hz Doppler, echo tap 30 @ 0.7
    RMS): both receivers ride the same deep-fade dropouts and recover
    the same packets (measured 38/96 == 38/96; at >=10 Hz Doppler both
    collapse together — the Costas tracking bandwidth is the shared
    limit, reference src/sync.c:832-841 loop constants)."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    import nrsc5_tpu.tx.channel as ch
    from support.ref_sensitivity import (build_capture, decode_framework,
                                         decode_reference)

    orig = ch.impair

    def impair_fad(sig, **kw):
        faded = ch.fading(sig, 2.0, delays=(0, 30), amps=(1.0, 0.7),
                          rng=np.random.default_rng(42))
        return orig(faded, **kw)

    ch.impair = impair_fad
    try:
        rng = np.random.default_rng(0xFADE)
        cu8, packets = build_capture(rng, 3, 20.0)
    finally:
        ch.impair = orig
    want = {bytes(p) for p in packets}
    ours = decode_framework(cu8) & want
    ref = decode_reference(mod, cu8) & want
    assert len(ours) >= len(ref) - 2, (len(ours), len(ref))
    assert len(ours) >= 30, len(ours)


@pytest.mark.parametrize("psmi", [5, 6])
def test_reference_agrees_mp5_mp6(reference_nrsc5, psmi):
    """MP5/MP6 service-mode cross-check: both receivers equalize the full
    14-partition extended band but decode only PM for cm 5/6 (reference:
    src/sync.c:343-357 — partitions_per_band=14, no PX slicing).  The
    extended partitions carry random filler occupancy; both receivers must
    report the psmi and decode the P1 program bit-exactly through it."""
    mod = reference_nrsc5
    sys.path.insert(0, REPO)
    import nrsc5_tpu.tx.channel as ch
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame

    from .capture_helpers import complex_to_cs16

    rng = np.random.default_rng(0x3B5 + psmi)
    n_frames = 4
    pids = np.zeros((16, 80), np.uint8)
    all_packets, mats = [], []
    for f in range(n_frames):
        pk = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
              for _ in range(32)]
        all_packets.extend(pk)
        mats.append(build_pm_matrix(
            build_p1_fm_frame(pk, 0, f % 8, (f * 32) % 64), pids))
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(4)])
    n_ext = C.partitions_per_band(psmi) - C.PM_PARTITIONS
    ext = rng.choice(np.array([-1, 1], np.int8),
                     (len(matrix), 2 * n_ext * C.PARTITION_DATA_CARRIERS * 2))
    sig = modulate_fm(matrix, bc_seq, psmi, ext_signs=ext)
    sig = ch.impair(sig, sample_offset=1500, cfo_hz=150.0, snr_db=25.0,
                    rng=rng)
    data = complex_to_cs16(sig)

    events = []
    radio = mod.NRSC5(lambda t, e: events.append((t, e)))
    radio.open_pipe()
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cs16(data[i:i + 131072])
    radio.close()

    ET = mod.EventType
    syncs = [e for t, e in events if t == ET.SYNC]
    assert syncs and any(s.psmi == psmi for s in syncs), \
        f"reference did not report psmi {psmi} sync: {syncs}"
    ref_hdc = {bytes(e.data) for t, e in events
               if t == ET.HDC and e.program == 0
               and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    want = set(all_packets)
    assert len(ref_hdc & want) >= 64, \
        f"reference decoded {len(ref_hdc & want)} P1 packets on psmi {psmi}"
    assert ref_hdc <= want, "reference emitted a corrupted packet"

    from nrsc5_tpu.api.events import EventType as OurET
    from nrsc5_tpu.api.session import MODE_FM, NRSC5

    our_events = []
    our = NRSC5.open_pipe(our_events.append, MODE_FM)
    cs16 = np.frombuffer(data, np.int16).reshape(-1, 2)
    csig = (cs16[:, 0] + 1j * cs16[:, 1]).astype(np.complex64) / 32767.0
    for i in range(0, len(csig), 131072):
        our.pipe_samples_cs16(csig[i:i + 131072])
    our.flush()

    our_syncs = {e.psmi for e in our_events if e.type == OurET.SYNC}
    assert psmi in our_syncs
    our_hdc = {e.data for e in our_events
               if e.type == OurET.HDC and not e.crc_error and e.program == 0}
    assert len(our_hdc & want) >= 64, \
        f"framework decoded {len(our_hdc & want)} P1 packets on psmi {psmi}"
    assert our_hdc <= want, "framework emitted a corrupted packet"
    # bit-exact agreement on the shared window
    assert len(ref_hdc & our_hdc) >= 64


def test_am_drift_beats_reference(reference_nrsc5):
    """Second AM asymmetry in our favor (after MA3 cold start): under
    ±50 ppm sample-clock drift the reference's one-shot AM training
    equalizer (one mult per column from the sum of its two training
    symbols, src/sync.c:676-700) cannot track the within-block phase
    ramp — its QAM64 symbols walk off the grid between the training
    rows, it relock-cycles, and recovers almost nothing.  Our
    interpolated training EQ (ops/sync_am.AM_EQ_INTERP; the two anchors
    are 16 symbol rows apart, ramp linear-fitted across columns) holds
    lock and decodes every post-warm-up frame of the identical capture.
    The timing loops are NOT the difference: both consume samples at
    the drifted rate (ours measured 69116.5/frame at +50 ppm vs the
    69120 nominal — exactly the resampled frame length)."""
    mod = reference_nrsc5
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.api.session import MODE_AM, NRSC5
    from nrsc5_tpu.tx import channel as ch

    from .capture_helpers import build_am_capture

    rng = np.random.default_rng(0xD41F7)
    n_frames = 16
    sig, packets = build_am_capture(rng, n_frames=n_frames, ma3=False)
    drifted = ch.clock_drift(np.asarray(sig, np.complex64), 50.0)
    want = {p for f, pk in packets if 6 <= f <= n_frames - 2 for p in pk}

    # the reference collapses: relock cycles, a handful of packets
    ref_events = _reference_decode_am(mod, drifted)
    ET = mod.EventType
    ref_hdc = {bytes(e.data) for t, e in ref_events
               if t == ET.HDC and e.program == 0
               and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    ref_got = sum(p in ref_hdc for p in want)

    events = []
    radio = NRSC5.open_pipe(events.append, MODE_AM)
    data = drifted.astype(np.complex64)
    for i in range(0, len(data), 16384):
        radio.pipe_samples_cs16(data[i:i + 16384])
    radio.flush()
    hdc = {e.data for e in events if e.type == EventType.HDC
           and not e.crc_error}
    got = sum(p in hdc for p in want)

    assert got == len(want), f"framework {got}/{len(want)} at +50 ppm"
    assert ref_got <= len(want) // 4, \
        f"reference now tracks AM drift ({ref_got}/{len(want)}) — " \
        "retire this asymmetry test"


def test_reference_agrees_mixed_band_auto_fleet(reference_nrsc5,
                                                golden_capture):
    """The round-5 flagship feature against the strongest oracle: an
    FM and an AM station served through ONE HeterogeneousReceiver with
    NO mode arguments (band + service mode discovered from each cu8
    stream), while the REFERENCE decodes the same signals through its
    own per-band sessions (one FM session on the cu8 capture, one AM
    session on the cs16 baseband — its per-dongle contract,
    src/nrsc5.c:325-358).  Every clean HDC packet set must line up
    per band, bit-exactly, minus the usual lock-edge frames."""
    mod = reference_nrsc5
    from nrsc5_tpu.api.events import EventType as OurET
    from nrsc5_tpu.serve import HeterogeneousReceiver
    from nrsc5_tpu.tx import channel as ch

    from .capture_helpers import build_am_capture

    rng = np.random.default_rng(0xA1FE)
    am_sig, am_packets = build_am_capture(rng, n_frames=12, ma3=False)

    # reference decodes each band via its own session
    ref_fm = _decode_with_reference(mod, golden_capture)
    ET = mod.EventType
    ref_fm_hdc = {bytes(e.data) for t, e in ref_fm
                  if t == ET.HDC and e.program == 0
                  and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    assert len(ref_fm_hdc) >= 64, len(ref_fm_hdc)
    ref_am = _reference_decode_am(mod, am_sig)
    ref_am_hdc = {bytes(e.data) for t, e in ref_am
                  if t == ET.HDC and e.program == 0
                  and not (e.flags & mod.PacketFlags.CRC_ERROR)}
    assert len(ref_am_hdc) >= 32, len(ref_am_hdc)

    # our mixed fleet: the same two signals as 1.488 MS/s cu8 wire,
    # one receiver, zero mode arguments
    up = ch.upsample_exact(am_sig, 32)
    am_wire = ch.to_cu8(up * (0.4 / np.abs(up).max())).tobytes()
    fm_wire = golden_capture.tobytes()
    events = {0: [], 1: []}
    rx = HeterogeneousReceiver(2, lambda st, ev: events[st].append(ev),
                               cold_start=True, input_format="cu8",
                               frames_per_dispatch=2)
    chunk = 2 * 1000 * 1000
    n = max(len(fm_wire), len(am_wire))
    for lo in range(0, n, chunk):
        rx.push(0, fm_wire[lo:lo + chunk])
        rx.push(1, am_wire[lo:lo + chunk])
    rx.flush()

    assert rx.station_modes[0] == ("fm", 1), rx.station_modes
    assert rx.station_modes[1] == ("am", False), rx.station_modes
    our_fm = {e.data for e in events[0]
              if e.type == OurET.HDC and not e.crc_error
              and e.program == 0}
    our_am = {e.data for e in events[1]
              if e.type == OurET.HDC and not e.crc_error}

    # FM parity: intersection coverage both ways (lock-edge tolerance,
    # same bars as test_reference_and_framework_agree)
    assert len(ref_fm_hdc & our_fm) >= 64, \
        (len(ref_fm_hdc & our_fm), len(ref_fm_hdc), len(our_fm))
    assert len(ref_fm_hdc - our_fm) <= 32, len(ref_fm_hdc - our_fm)
    assert len(our_fm - ref_fm_hdc) <= 32, len(our_fm - ref_fm_hdc)
    # no cross-band leakage through the shared surface
    assert not (our_fm & {bytes(b) for _, pk in am_packets for b in pk})

    # AM parity: the mid-capture frames both receivers fully decode
    # (the reference warms its diversity delay over frames 0-3; our
    # fleet discovers the band at ~frame 3 and re-arms the same
    # warm-up) must agree bit-exactly with the transmitted truth
    want = {bytes(b) for f, pk in am_packets if f in (8, 9) for b in pk}
    assert want <= ref_am_hdc, "reference missed mid-capture AM frames"
    assert want <= our_am, \
        f"fleet missed {len(want - our_am)}/{len(want)} AM packets"
