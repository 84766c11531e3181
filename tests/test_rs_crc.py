"""Reed-Solomon and CRC tests."""

import numpy as np

from nrsc5_tpu.ops.rs import rs_decode_pdu, rs_encode_pdu
from nrsc5_tpu.utils import crc


def test_rs_roundtrip_clean(rng):
    data = rng.integers(0, 256, (5, 88)).astype(np.uint8)
    cw = rs_encode_pdu(data)
    assert cw.shape == (5, 96)
    out, ok, n = rs_decode_pdu(cw)
    assert np.all(ok)
    assert np.all(n == 0)
    assert np.array_equal(out, cw)


def test_rs_corrects_up_to_4_errors(rng):
    data = rng.integers(0, 256, 88).astype(np.uint8)
    cw = rs_encode_pdu(data)
    for nerr in range(1, 5):
        for trial in range(10):
            bad = cw.copy()
            pos = rng.choice(96, size=nerr, replace=False)
            bad[pos] ^= rng.integers(1, 256, nerr).astype(np.uint8)
            out, ok, n = rs_decode_pdu(bad)
            assert ok, f"nerr={nerr} trial={trial}"
            assert n == nerr
            assert np.array_equal(out, cw)


def test_rs_detects_excess_errors(rng):
    data = rng.integers(0, 256, 88).astype(np.uint8)
    cw = rs_encode_pdu(data)
    detected = 0
    for trial in range(50):
        bad = cw.copy()
        pos = rng.choice(96, size=8, replace=False)
        bad[pos] ^= rng.integers(1, 256, 8).astype(np.uint8)
        out, ok, n = rs_decode_pdu(bad)
        if not ok:
            detected += 1
        else:
            # miscorrection is possible but must still be a valid codeword
            r, rok, _ = rs_decode_pdu(out)
            assert rok and np.array_equal(r, out)
    assert detected >= 45  # overwhelming majority detected


def test_rs_batched_mixed(rng):
    data = rng.integers(0, 256, (8, 88)).astype(np.uint8)
    cw = rs_encode_pdu(data)
    bad = cw.copy()
    bad[3, 10] ^= 0x55
    bad[5, [0, 20, 40, 60]] ^= 0xAA
    out, ok, n = rs_decode_pdu(bad)
    assert np.all(ok)
    assert np.array_equal(out, cw)
    assert n[3] == 1 and n[5] == 4


def test_crc8_matches_reference_table():
    # reference table first entries (src/frame.c:60-65)
    ref_head = [0, 0x31, 0x62, 0x53, 0xC4, 0xF5, 0xA6, 0x97, 0xB9, 0x88]
    assert crc.crc8_table()[:10].tolist() == ref_head


def test_fcs16_matches_reference_table():
    ref_head = [0x0000, 0x1189, 0x2312, 0x329B, 0x4624, 0x57AD, 0x6536, 0x74BF]
    assert crc.fcs16_table()[:8].tolist() == ref_head
    # HDLC good-FCS invariant
    payload = b"\x21hello world"
    framed = crc.fcs16_append(payload)
    assert crc.fcs16(framed) == crc.VALIDFCS16


def test_crc8_zero_over_packet_plus_checksum(rng):
    pkt = bytes(rng.integers(0, 256, 32).astype(np.uint8))
    chk = crc.crc8(pkt)
    assert crc.crc8(pkt + bytes([chk])) == 0


def test_crc12_embed_roundtrip(rng):
    bits68 = rng.integers(0, 2, 68).astype(np.uint8)
    frame = crc.crc12_embed(bits68)
    field = 0
    for i in range(68, 80):
        field = (field << 1) | int(frame[i])
    assert field == crc.crc12(frame)


def test_rs_native_matches_numpy(rng):
    """The C++ transport-path RS decoder must agree with the batched numpy
    spec on clean, correctable, and uncorrectable codewords."""
    from nrsc5_tpu import native
    from nrsc5_tpu.ops.rs import rs_decode_pdu_numpy

    if native.get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    cases = []
    for nerr in range(0, 7):
        for _ in range(25):
            cw = rs_encode_pdu(rng.integers(0, 256, 88).astype(np.uint8))
            if nerr:
                pos = rng.choice(96, size=nerr, replace=False)
                cw[pos] ^= rng.integers(1, 256, nerr).astype(np.uint8)
            cases.append(cw)
    batch = np.stack(cases)
    out_n, ok_n, nc_n = rs_decode_pdu_numpy(batch)
    out_c, ok_c, nc_c = native.rs_decode_pdu(batch)
    assert np.array_equal(ok_n, ok_c)
    # where both decode, the corrections and counts must match exactly
    assert np.array_equal(out_n[ok_n], out_c[ok_n])
    assert np.array_equal(nc_n[ok_n], nc_c[ok_n])
    # failures must leave data unchanged
    assert np.array_equal(out_c[~ok_c], batch[~ok_c])
