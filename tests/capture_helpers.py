"""Shared synthetic-capture builders for the session and reference
cross-check tests (truth harness: nrsc5_tpu/tx)."""

import numpy as np

from nrsc5_tpu import constants as C


def build_am_capture(rng, n_frames: int = 7, ma3: bool = False,
                     sis_frames=None):
    """MA1/MA3 AM capture with 466-byte audio PDUs; returns
    (complex64 signal @ 46.5 kS/s, [(frame, [packet bytes])...]).
    sis_frames: optional list of 80-bit PIDS frames (device bit order,
    e.g. from tx.sis_encoder) cycled across blocks; default random."""
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    packets = []
    p1_bits = np.zeros((n_frames, 8, C.P1_FRAME_LEN_AM), np.uint8)
    for f in range(n_frames):
        for sub in range(8):
            pk = [rng.integers(0, 256, 90).astype(np.uint8).tobytes()
                  for _ in range(4)]
            packets.append((f, pk))
            g = f * 8 + sub
            p1_bits[f, sub] = build_p1_am_frame(
                pk, 0, pdu_seq=sub, seq=(g * 4) % 64)
    p3_len = C.P3_FRAME_LEN_MA3 if ma3 else C.P3_FRAME_LEN_MA1
    p3 = rng.integers(0, 2, (n_frames, p3_len)).astype(np.uint8)
    mats = EAM.interleave_frames(
        [EAM.encode_p1_am(p1_bits[f]) for f in range(n_frames)],
        [EAM.encode_p3_am(p3[f], ma3) for f in range(n_frames)], ma3)
    if sis_frames is None:
        pids = np.stack([EAM.encode_pids_am(
            rng.integers(0, 2, 80).astype(np.uint8))
            for _ in range(n_frames * 8)])
    else:
        pids = np.stack([EAM.encode_pids_am(
            np.asarray(sis_frames[b % len(sis_frames)], np.uint8))
            for b in range(n_frames * 8)])
    psmi = C.SERVICE_MODE_MA3 if ma3 else C.SERVICE_MODE_MA1
    ref = np.stack([EAM.am_ref_bits(b % 8, psmi)
                    for b in range(n_frames * 8)])
    sig = modulate_am(mats, pids, ref, ma3)
    return sig, packets


def build_fm_mp3_capture(rng, n_cycles: int = 2):
    """MP3 service-mode FM capture: program-1 audio (SPS) in P3 PDUs over
    the PX1 interleaver-IV channel, program-0 audio in P1; returns
    (complex64 signal @ 744 kS/s, [(cycle, [p3 packet bytes])...])."""
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_pm_matrix, build_px_stream
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import (build_audio_pdu,
                                                build_p1_fm_frame, pack_frame)

    psmi, fl = 3, C.P3_FRAME_LEN_MP3_MP11
    p3_bytes = (fl - 24) // 8  # 573

    p3_packets = []
    p3_bits = np.zeros((n_cycles, 16, fl), np.uint8)
    for cyc in range(n_cycles):
        for f in range(16):
            pkts = [rng.integers(0, 256, 150).astype(np.uint8).tobytes()
                    for _ in range(3)]
            p3_packets.append((cyc, pkts))
            g = cyc * 16 + f
            pdu = build_audio_pdu(pkts, program=1, pdu_seq=g % 8,
                                  seq=(g * 3) % 64, total_len=p3_bytes)
            p3_bits[cyc, f] = pack_frame(pdu, fl, C.PCI_AUDIO)
    stream = build_px_stream(p3_bits, fl)
    sview = stream.reshape(n_cycles * 32 * C.BLKSZ, -1)
    width = sview.shape[1]

    # P1 must carry valid audio PDUs too (garbage would hard-resync)
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
    return sig, p3_packets


def here_packet(image_type, tile, timestamp, name, data, lat1=37.5,
                lon1=-122.5):
    """One 0xFFF7FFF7-framed HERE image packet (reference:
    src/here_images.c:22-99; traffic type nibble = 8, weather = 13)."""
    body = bytearray(28)
    body[0] = (image_type << 4) | 5  # seq 5
    body[2:4] = tile.to_bytes(2, "big")
    body[4:6] = (0).to_bytes(2, "big")
    body[9:13] = timestamp.to_bytes(4, "big")
    la1 = abs(int(lat1 * 100000))
    lo1 = abs(int(lon1 * 100000))
    body[14] = ((la1 >> 18) & 0x7F) | (0x80 if lat1 < 0 else 0)
    body[15] = (la1 >> 10) & 0xFF
    body[16] = (la1 >> 2) & 0xFF
    body[17] = ((la1 & 0x3) << 6) | (0x20 if lon1 < 0 else 0) \
        | ((lo1 >> 20) & 0x1F)
    body[18] = (lo1 >> 12) & 0xFF
    body[19] = (lo1 >> 4) & 0xFF
    body[20] = (lo1 & 0xF) << 4
    body[27] = len(name)
    body += name.encode()
    body += bytes(4)  # buffer[28+len .. 32+len)
    body += len(data).to_bytes(2, "big")
    body += data
    return b"\xff\xf7\xff\xf7" + len(body).to_bytes(2, "big") \
        + bytes(body) + b"\x00\x00"


def complex_to_cs16(sig: np.ndarray) -> bytes:
    """Complex baseband -> interleaved int16 Q15 bytes (reference cs16
    ingest format, src/input.c:119-124)."""
    out = np.empty(len(sig) * 2, np.int16)
    out[0::2] = np.clip(np.round(np.real(sig) * 32767), -32768, 32767)
    out[1::2] = np.clip(np.round(np.imag(sig) * 32767), -32768, 32767)
    return out.tobytes()


def id3_tag(title=None, artist=None, album=None, genre=None,
            ufid=None, xhdr=None, comment=None, commercial=None) -> bytes:
    """ID3v2.3 tag with text frames, UFID, COMM, COMR and XHDR (decoder:
    transport/id3.py; reference: src/output.c:248-491).  ufid =
    (owner, id) strings; comment = (lang, short_desc, text);
    xhdr = (mime_u32, param, ext_bytes); commercial = (price,
    until_yyyymmdd, url, received_as, seller, desc)."""
    frames = b""

    def frame(fid: bytes, data: bytes) -> bytes:
        return fid + len(data).to_bytes(4, "big") + b"\x00\x00" + data

    for fid, text in ((b"TIT2", title), (b"TPE1", artist),
                      (b"TALB", album), (b"TCON", genre)):
        if text is not None:
            frames += frame(fid, b"\x00" + text.encode("latin-1"))
    if ufid is not None:
        owner, uid = ufid
        frames += frame(b"UFID", owner.encode() + b"\x00" + uid.encode())
    if comment is not None:
        lang, short, text = comment
        frames += frame(b"COMM", b"\x00" + lang.encode()
                        + short.encode("latin-1") + b"\x00"
                        + text.encode("latin-1"))
    if commercial is not None:
        price, until, url, received_as, seller, desc = commercial
        frames += frame(b"COMR", b"\x00" + price.encode("latin-1") + b"\x00"
                        + until.encode("latin-1") + url.encode("latin-1")
                        + b"\x00" + bytes([received_as])
                        + seller.encode("latin-1") + b"\x00"
                        + desc.encode("latin-1") + b"\x00")
    if xhdr is not None:
        mime, param, ext = xhdr
        frames += frame(b"XHDR", mime.to_bytes(4, "little")
                        + bytes([param, len(ext)]) + ext)
    size = len(frames)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + ss + frames


def fm_capture_cu8(mats, dummy, rng, sample_offset=1000, cfo_hz=100.0,
                   snr_db=25.0):
    """Standard FM cu8 capture scaffold: 2-block dummy lead + frames +
    4-block dummy trail, modulate, impair, upsample to 1.488 MS/s cu8."""
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.modulator import modulate_fm

    n_frames = len(mats)
    matrix = np.concatenate([dummy[14 * 32:]] + list(mats) + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames), np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1, amplitude=0.15)
    sig = ch.impair(sig, sample_offset=sample_offset, cfo_hz=cfo_hz,
                    snr_db=snr_db, rng=rng)
    return ch.to_cu8(ch.upsample2(sig))


def build_fm_mp11_capture(rng, n_cycles: int = 2):
    """MP11 service-mode FM capture (widest mode): program-1 audio in P3
    PDUs over PX1 and program-2 audio in P4 PDUs over PX2 (both
    interleaver-IV), program-0 audio in P1; returns (complex64 signal @
    744 kS/s, [(cycle, [p3 pkts])...], [(cycle, [p4 pkts])...])."""
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_pm_matrix, build_px_stream
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import (build_audio_pdu,
                                                build_p1_fm_frame, pack_frame)

    psmi, fl = 11, C.P3_FRAME_LEN_MP3_MP11
    px_bytes = (fl - 24) // 8  # 573

    def px_program(program, seed):
        # codec mode 13 (avg 4 packets/frame, 12-bit locations): the
        # realistic SPS-over-P3 cadence — with seq advancing 4/frame the
        # elastic output offset (frame.c:602-609 seq math) stays aligned
        # and full cycles surface from both receivers
        prng = np.random.default_rng(seed)
        packets = []
        bits = np.zeros((n_cycles, 16, fl), np.uint8)
        for cyc in range(n_cycles):
            for f in range(16):
                pkts = [prng.integers(0, 256, 120).astype(np.uint8)
                        .tobytes() for _ in range(4)]
                packets.append((cyc, pkts))
                g = cyc * 16 + f
                pdu = build_audio_pdu(pkts, program=program,
                                      pdu_seq=g % 8, seq=(g * 4) % 64,
                                      codec_mode=13, total_len=px_bytes)
                bits[cyc, f] = pack_frame(pdu, fl, C.PCI_AUDIO)
        stream = build_px_stream(bits, fl)
        return packets, stream.reshape(n_cycles * 32 * C.BLKSZ, -1)

    p3_packets, px1_view = px_program(1, rng.integers(1 << 30))
    p4_packets, px2_view = px_program(2, rng.integers(1 << 30))
    width = px1_view.shape[1]

    # P1 must carry valid audio PDUs too (garbage would hard-resync)
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
    px1_all = np.concatenate([junk, px1_view, trail])
    px2_all = np.concatenate([junk, px2_view, trail])
    bc_seq = np.concatenate([np.arange(16 - lead, 16),
                             np.tile(np.arange(16), 2 * n_cycles),
                             np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px1_all,
                      px2_signs=px2_all)
    sig = ch.impair(sig, snr_db=25.0, rng=rng)
    return sig, p3_packets, p4_packets
