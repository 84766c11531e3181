"""PIDS/SIS decoder tests: frames are built with a TX-side bit writer and
pushed through the decoder; events are checked against intent."""

import numpy as np
import pytest

from nrsc5_tpu.api.events import EventType
from nrsc5_tpu.transport import pids as P
from nrsc5_tpu.utils.crc import alert_cnt_crc, alert_crc7, crc12


class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def u_rev(self, value: int, n: int):
        for i in range(n):
            self.bits.append((value >> i) & 1)
        return self

    def char5(self, ch: str):
        return self.u(P.CHAR5.index(ch), 5)


def make_frame(*payloads) -> np.ndarray:
    """Assemble (msg_id, body BitWriter) payloads into an 80-bit PIDS frame
    in device bit order (inverse of pids.py frame_push reordering)."""
    w = BitWriter()
    w.u(P.PIDS_TYPE_SIS, 1)
    w.u(len(payloads) - 1, 1)
    for msg_id, body in payloads:
        w.u(msg_id, 4)
        w.bits.extend(body.bits)
    frame = np.zeros(80, np.uint8)
    frame[:len(w.bits)] = w.bits
    crc = crc12(frame)
    for i in range(12):
        frame[68 + i] = (crc >> (11 - i)) & 1
    # device order reverses bits within bytes
    return frame.reshape(10, 8)[:, ::-1].reshape(-1)


class Sink:
    def __init__(self):
        self.events = []

    def __call__(self, ev):
        self.events.append(ev)

    def of(self, t):
        return [e for e in self.events if e.type == t]


def test_station_id_and_short_name():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    body_id = BitWriter().char5("U").char5("S").u(0, 3).u(12345, 19)
    body_nm = (BitWriter().char5("K").char5("Q").char5("E").char5("D")
               .u(0b01, 2))
    dec.frame_push(make_frame((P.MSG_STATION_ID, body_id),
                              (P.MSG_STATION_NAME_SHORT, body_nm)))
    sid = sink.of(EventType.STATION_ID)
    assert sid and sid[0].country_code == "US"
    assert sid[0].fcc_facility_id == 12345
    nm = sink.of(EventType.STATION_NAME)
    assert nm and nm[0].name == "KQED-FM"
    sis = sink.of(EventType.SIS)
    assert sis and sis[-1].name == "KQED-FM" and sis[-1].country_code == "US"
    # repeat frame: no duplicate events
    n = len(sink.events)
    dec.frame_push(make_frame((P.MSG_STATION_ID, body_id),
                              (P.MSG_STATION_NAME_SHORT, body_nm)))
    assert len(sink.events) == n


def test_corrupt_crc_ignored():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    frame = make_frame((P.MSG_STATION_ID,
                        BitWriter().char5("U").char5("S").u(0, 3).u(1, 19)))
    frame = frame.copy()
    frame[5] ^= 1
    dec.frame_push(frame)
    assert not sink.events


def test_long_name_multiframe():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    text = b"Quiet Storm 98"
    padded = text + b"\0" * (21 - len(text))
    frames = []
    for cur in range(3):
        w = BitWriter().u(2, 3).u(cur, 3)
        for j in range(7):
            w.u(padded[cur * 7 + j], 7)
        w.u(5, 3)  # seq in the trailing bits
        frames.append(make_frame((P.MSG_STATION_NAME_LONG, w)))
    for f in frames:
        dec.frame_push(f)
    sl = sink.of(EventType.STATION_SLOGAN)
    assert sl and sl[0].slogan == "Quiet Storm 98"


def test_location_pair():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    lat = int(37.77 * 8192)
    lon = int(-122.42 * 8192) & ((1 << 22) - 1)
    dec.frame_push(make_frame(
        (P.MSG_STATION_LOCATION, BitWriter().u(1, 1).u(lat, 22).u(0x1, 4))))
    assert not sink.of(EventType.STATION_LOCATION)  # needs both halves
    dec.frame_push(make_frame(
        (P.MSG_STATION_LOCATION, BitWriter().u(0, 1).u(lon, 22).u(0x2, 4))))
    loc = sink.of(EventType.STATION_LOCATION)
    assert loc
    assert abs(loc[0].latitude - 37.77) < 1e-3
    assert abs(loc[0].longitude + 122.42) < 1e-3
    assert loc[0].altitude == (0x1 << 8) | (0x2 << 4)


def test_station_message_checksum():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    text = b"Hello HD"
    checksum = sum(text)
    checksum = (((checksum >> 8) & 0x7F) + (checksum & 0xFF)) & 0x7F
    padded = text + b"\0" * (16 - len(text))
    w0 = (BitWriter().u(0, 5).u(1, 2).u(0, 1).u(P.ENCODING_ISO_8859_1, 3)
          .u(len(text), 8).u(checksum, 7))
    for j in range(4):
        w0.u(padded[j], 8)
    dec.frame_push(make_frame((P.MSG_STATION_MESSAGE, w0)))
    w1 = BitWriter().u(1, 5).u(1, 2).u(0, 3)
    for j in range(6):
        w1.u(padded[4 + j], 8)
    dec.frame_push(make_frame((P.MSG_STATION_MESSAGE, w1)))
    msg = sink.of(EventType.STATION_MESSAGE)
    assert msg and msg[0].message == "Hello HD"


def test_service_info_and_parameters():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    w = BitWriter().u(0, 2).u(0, 1).u(2, 6).u(4, 8).u(0, 5).u(3, 5)
    dec.frame_push(make_frame((P.MSG_SERVICE_INFORMATION, w)))
    asd = sink.of(EventType.AUDIO_SERVICE_DESCRIPTOR)
    # NB .type is the event type; the service type lives in .data
    assert asd and asd[0].program == 2 and asd[0].payload["type"] == 4
    assert asd[0].sound_exp == 3

    wd = BitWriter().u(1, 2).u(1, 1).u(9, 9).u(0, 3).u(0x40, 12)
    dec.frame_push(make_frame((P.MSG_ADV_SERVICE_INFORMATION, wd)))
    dsd = sink.of(EventType.DATA_SERVICE_DESCRIPTOR)
    assert dsd and dsd[0].payload["type"] == 9 and dsd[0].mime_type == 0x40

    # local time parameter (index 3): tzo=-300, dst bits
    val = ((-300 & 0x7FF) << 5) | (0b010 << 2) | (1 << 1) | 1
    dec.frame_push(make_frame(
        (P.MSG_PARAMETER_MESSAGE, BitWriter().u(3, 6).u(val, 16))))
    lt = sink.of(EventType.LOCAL_TIME)
    assert lt and lt[0].utc_offset == -300 and lt[0].dst_local == 1


def test_universal_short_name():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    name = b"WXYZ\0\0"
    w = BitWriter().u(0, 4).u(0, 1).u(P.ENCODING_ISO_8859_1, 3).u(1, 1).u(0, 1)
    for b in name:
        w.u(b, 8)
    dec.frame_push(make_frame((P.MSG_UNIVERSAL_SHORT_STATION_NAME, w)))
    nm = sink.of(EventType.STATION_NAME)
    assert nm and nm[0].name == "WXYZ-FM"


def _build_alert(text: bytes, locations, location_format=P.LOCATION_FORMAT_SAME,
                 cat1=3, cat2=7):
    """Construct a full alert payload: CNT header (with valid CNT CRC) +
    text, plus the CRC7 over everything."""
    w = BitWriter()
    w.u_rev(0, 8)  # unknown
    w.u_rev(0, 12)  # CNT CRC placeholder
    w.u_rev(0, 8)  # unknown
    w.u_rev(cat1, 5)
    w.u_rev(cat2, 5)
    w.u_rev(0, 9)
    w.u_rev(location_format, 3)
    w.u_rev(len(locations), 5)
    w.u_rev(0, 1)
    full_len = 20 if location_format == P.LOCATION_FORMAT_SAME else 17
    for i, loc in enumerate(locations):
        if i > 0:
            w.u_rev(1, 1)  # full-length flag
        w.u_rev(loc, full_len)
    while len(w.bits) % 8:
        w.u_rev(0, 1)
    cnt_bytes = len(w.bits) // 8
    if cnt_bytes % 2 == 0:
        w.u_rev(0, 8)
        cnt_bytes += 1
    cnt = bytearray(np.packbits(np.array(w.bits, np.uint8),
                                bitorder="little").tobytes())
    crc = alert_cnt_crc(bytes(cnt))
    cnt[1] = crc & 0xFF
    cnt[2] = (cnt[2] & 0xF0) | (crc >> 8)
    payload = bytes(cnt) + text
    return payload, cnt_bytes


def test_emergency_alert_roundtrip():
    sink = Sink()
    dec = P.PIDSDecoder(sink)
    payload, cnt_len = _build_alert(b"TORNADO WARNING", [123456, 123467])
    crc7 = alert_crc7(payload)
    n_frames = (len(payload) + 8) // 6

    for cur in range(n_frames):
        w = BitWriter().u(cur, 6).u(1, 2).u(0, 2)
        if cur == 0:
            w.u(P.ENCODING_ISO_8859_1, 3).u(len(payload), 9).u(crc7, 7)
            w.u((cnt_len - 1) // 2, 5)
            chunk = payload[:3]
        else:
            chunk = payload[cur * 6 - 3: cur * 6 + 3]
        for b in chunk.ljust(6 if cur else 3, b"\0"):
            w.u(b, 8)
        dec.frame_push(make_frame((P.MSG_EMERGENCY_ALERTS, w)))

    al = sink.of(EventType.EMERGENCY_ALERT)
    assert al, "alert not decoded"
    assert al[0].message == "TORNADO WARNING"
    assert al[0].category1 == 3 and al[0].category2 == 7
    assert al[0].locations == [123456, 123467]

    # timeout: 16 SIS frames without alert payloads clears it
    body_id = BitWriter().char5("U").char5("S").u(0, 3).u(7, 19)
    for _ in range(P.ALERT_TIMEOUT_LIMIT):
        dec.frame_push(make_frame((P.MSG_STATION_ID, body_id)))
    cleared = sink.of(EventType.EMERGENCY_ALERT)
    assert cleared[-1].message is None
