"""Fixed data subchannels on the P1 frame (reference: src/frame.c:393-514):
sync-width detection, CCC configuration, BBM block reassembly → AAS."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import EventType
from nrsc5_tpu.transport import frame as TF
from nrsc5_tpu.transport.frame import BBM_MAGIC
from nrsc5_tpu.transport.output import Output
from nrsc5_tpu.tx.transport_encoder import (aas_frame, build_audio_pdu,
                                            hdlc_escape, pack_frame)
from nrsc5_tpu.utils.crc import fcs16_append

SYNC_BYTE = 0xFF  # width = 15 * 2 = 30
SYNC_WIDTH = 30
SUB_LEN = 64


def ccc_config() -> bytes:
    """CCC payload enabling subchannel 0 (mode 0, length SUB_LEN)."""
    payload = bytearray([0x00])
    for i in range(4):
        mode = 0
        length = SUB_LEN if i == 0 else 0
        payload += bytes([mode & 0xFF, mode >> 8, length & 0xFF, length >> 8])
    return b"\x7e" + hdlc_escape(fcs16_append(bytes(payload))) + b"\x7e"


def fixed_tail(ccc_chunk: bytes, sub_chunk: bytes) -> bytes:
    """[sub0 data][ccc chunk padded to SYNC_WIDTH][sync byte]."""
    assert len(ccc_chunk) <= SYNC_WIDTH
    ccc = ccc_chunk.ljust(SYNC_WIDTH, b"\x7e")
    assert len(sub_chunk) == SUB_LEN
    return sub_chunk + ccc + bytes([SYNC_BYTE])


def test_fixed_subchannel_aas(rng):
    sink = []
    out = Output(sink.append)
    dec = TF.FrameDecoder(out)

    # AAS LOT-less stream: send an ID3 on the PSD port via the subchannel
    tit2 = b"TIT2" + (2).to_bytes(4, "big") + b"\x00\x00" + b"\x00X"
    inner = aas_frame(0x5100, 1, b"ID3\x03\x00\x00"
                      + bytes([0, 0, 0, len(tit2)]) + tit2)
    block = BBM_MAGIC + inner.ljust(255, b"\x7e")
    assert len(block) == 259
    stream = block + bytes([0x7E]) * (5 * SUB_LEN - len(block))
    sub_chunks = [stream[i * SUB_LEN:(i + 1) * SUB_LEN] for i in range(5)]

    pkts = [rng.integers(0, 256, 200).astype(np.uint8).tobytes()
            for _ in range(2)]
    ccc = ccc_config()
    total = C.MAX_PDU_LEN - len(fixed_tail(ccc, sub_chunks[0]))

    for f in range(7):
        sub = sub_chunks[min(max(f - 2, 0), 4)] if f >= 2 else b"\x7e" * SUB_LEN
        pdu = build_audio_pdu(pkts, pdu_seq=f % 8, seq=(f * 32) % 64,
                              total_len=total)
        buf = pdu.tobytes() + fixed_tail(ccc, sub)
        bits = pack_frame(np.frombuffer(buf, np.uint8), C.P1_FRAME_LEN_FM,
                          C.PCI_AUDIO_FIXED)
        dec.push_frame(bits, TF.P1)

    id3 = [e for e in sink if e.type == EventType.ID3]
    assert id3 and id3[0].title == "X", \
        f"no ID3 via fixed subchannel: {[e.type for e in sink]}"
    # audio packets still parsed from the same frames
    for _ in range(4):
        out.advance()
    hdc = {e.data for e in sink if e.type == EventType.HDC}
    assert pkts[0] in hdc
