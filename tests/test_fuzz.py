"""Robustness fuzzing of every host-side parser: random and corrupted
bytes must NEVER raise — a garbage frame is dropped, not a crash.

The reference survives hostile RF by construction (C parsers with bounds
checks); this is the framework's equivalent gate for production serving.
Seeded, so failures reproduce.
"""

import numpy as np
import pytest

from nrsc5_tpu import constants as C


def _sink(events):
    return events.append


def test_fuzz_frame_decoder(rng):
    """Random decoded-frame bits through the full transport parse, all
    frame lengths the receiver produces."""
    from nrsc5_tpu.transport.frame import P1, P3, FrameDecoder
    from nrsc5_tpu.transport.output import Output

    events = []
    out = Output(_sink(events))
    dec = FrameDecoder(out)
    for length, lc in ((C.P1_FRAME_LEN_FM, P1), (C.P3_FRAME_LEN_MP3_MP11, P3),
                       (C.P3_FRAME_LEN_MP2, P3), (C.P1_FRAME_LEN_AM, P1),
                       (C.P3_FRAME_LEN_MA1, P3), (C.P3_FRAME_LEN_MA3, P3)):
        for _ in range(8):
            bits = rng.integers(0, 2, length).astype(np.uint8)
            dec.push_frame(bits, lc)
    # bias toward "almost valid": valid PCI, random payload
    from nrsc5_tpu.tx.transport_encoder import pack_frame

    for _ in range(8):
        buf = rng.integers(0, 256, C.P1_FRAME_LEN_FM // 8 - 3).astype(np.uint8)
        bits = pack_frame(buf, C.P1_FRAME_LEN_FM, C.PCI_AUDIO)
        dec.push_frame(bits, P1)
        out.advance()


def test_fuzz_pids(rng):
    from nrsc5_tpu.transport.pids import PIDSDecoder

    events = []
    pd = PIDSDecoder(_sink(events))
    for _ in range(2000):
        pd.frame_push(rng.integers(0, 2, 80).astype(np.uint8))
    # valid CRC, random payload: exercises every message handler
    from nrsc5_tpu.utils.crc import crc12_embed

    for _ in range(2000):
        frame = crc12_embed(rng.integers(0, 2, 68).astype(np.uint8))
        pd.frame_push(frame.reshape(10, 8)[:, ::-1].reshape(-1))


def test_fuzz_aas_and_ports(rng):
    """Random AAS frames, and random payloads on LOT/stream/packet ports
    behind a valid SIG table."""
    from nrsc5_tpu.transport.output import Output

    events = []
    out = Output(_sink(events))
    for _ in range(200):
        out.aas_push(rng.integers(0, 256, rng.integers(0, 600))
                     .astype(np.uint8).tobytes())
    # valid SIG with one component of each type, then fuzz the ports
    sig = bytearray()
    sig += bytes([0x41, 0x01, 0x00, 0x00])
    sig += bytes([0x69, 3]) + b"\x00ab"
    for ctype, port in ((0, 0x2001), (1, 0x2002), (3, 0x2003)):
        comp = bytes([0x00, port & 0xFF, port >> 8, 0, 0, ctype, 0, 0]) \
            + (0xB7F03DFC if ctype == 0 else 0x4F328CA0).to_bytes(4, "little")
        sig += bytes([0x67, 1 + len(comp)]) + comp
    out.aas_push(bytes([0x20 & 0xFF, 0x00, 0, 0]) + bytes(sig))
    for _ in range(300):
        port = int(rng.choice([0x2001, 0x2002, 0x2003, 0x5100, 0x20]))
        payload = rng.integers(0, 256, rng.integers(0, 400)) \
            .astype(np.uint8).tobytes()
        out.aas_push(bytes([port & 0xFF, port >> 8, 0, 0]) + payload)


def test_fuzz_id3(rng):
    from nrsc5_tpu.transport.id3 import parse_id3

    for _ in range(300):
        parse_id3(rng.integers(0, 256, rng.integers(0, 300))
                  .astype(np.uint8).tobytes())
    # valid ID3 header, random frame soup
    for _ in range(300):
        body = rng.integers(0, 256, 120).astype(np.uint8).tobytes()
        size = len(body)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        parse_id3(b"ID3\x03\x00\x00" + ss + body)


def test_fuzz_here_images(rng):
    from nrsc5_tpu.transport.here_images import HereImages

    events = []
    hi = HereImages(_sink(events))
    seq = 0
    for _ in range(200):
        chunk = rng.integers(0, 256, rng.integers(0, 200)).astype(np.uint8)
        # sprinkle sync words so the packet parser runs on garbage bodies
        if rng.random() < 0.3 and len(chunk) > 10:
            chunk[:4] = [0xFF, 0xF7, 0xFF, 0xF7]
        hi.push(seq, chunk.tobytes())
        seq = (seq + int(rng.integers(1, 3))) & 0xFFFF


def test_fuzz_hdc_decoder(rng):
    """The built-in codec must reject garbage packets without raising."""
    from nrsc5_tpu.audio.hdc_decoder import HDCDecoder

    dec = HDCDecoder()
    ok = 0
    for _ in range(60):
        pkt = rng.integers(0, 256, rng.integers(1, 500)) \
            .astype(np.uint8).tobytes()
        try:
            out = dec.decode(pkt)
        except Exception as e:  # noqa: BLE001 - the gate itself
            pytest.fail(f"codec raised on garbage: {type(e).__name__}: {e}")
        ok += out is not None
    # garbage should essentially never decode as a valid frame
    assert ok <= 3
