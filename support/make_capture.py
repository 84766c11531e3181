"""Generate a golden FM cu8 capture for the CLI end-to-end check.

The reference CI decodes support/sample.xz and greps for its ID3 title
(.github/workflows/ci.yml:30-42); that capture is not redistributable, so
CI here generates an equivalent one with the truth harness and asserts the
same observable behavior.  The capture carries:

  * program-0 audio: real HDC packets (tx/hdc_encoder) of a tone mix —
    decoding produces actual PCM through the built-in codec;
  * PSD ID3 with the golden title;
  * a SIG table (data service, LOT component on port 0x1001) and a
    single-fragment LOT file ("tpu.png") for the AAS path.

Usage: python support/make_capture.py OUT.cu8 [title]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOT_NAME = "tpu.png"
LOT_DATA = bytes(range(100))
LOT_ID = 7
SIG_PORT = 0x1001


def id3(text):
    fr = b"TIT2" + (len(text) + 1).to_bytes(4, "big") + b"\x00\x00" \
        + b"\x00" + text.encode("latin-1")
    size = len(fr)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + ss + fr


def sig_table() -> bytes:
    """One data service carrying a LOT component (reference SIG record
    layout: src/output.c:493-625)."""
    buf = bytearray()
    buf += bytes([0x41, 0x01, 0x00, 0x00])  # data service #1
    name = b"\x00Traffic"
    buf += bytes([0x69, 1 + len(name)]) + name
    comp = bytes([0x00, SIG_PORT & 0xFF, SIG_PORT >> 8, 0x00, 0x00,
                  3,  # AASType.LOT
                  0, 0])
    comp += (0x4F328CA0).to_bytes(4, "little")  # MIMEType.PNG
    buf += bytes([0x67, 1 + len(comp)]) + comp
    return bytes(buf)


def lot_fragment() -> bytes:
    """Single complete-file LOT fragment (reference: src/output.c:627-760)."""
    meta = bytearray(16)
    meta[0:4] = (1).to_bytes(4, "little")  # LOT header version 1
    # expiry 2027-06-15 12:30 UTC, packed per reference src/output.c:764-768
    year, mon, mday, hour, minute = 2027, 6, 15, 12, 30
    meta[4] = ((hour & 0x3) << 6) | minute
    meta[5] = (mday << 3) | (hour >> 2)
    meta[6] = ((year & 0xF) << 4) | mon
    meta[7] = year >> 4
    meta[8:12] = len(LOT_DATA).to_bytes(4, "little")
    meta[12:16] = (0x4F328CA0).to_bytes(4, "little")
    meta += LOT_NAME.encode()
    hdr = bytearray([8 + len(meta), 0, LOT_ID & 0xFF, LOT_ID >> 8])
    hdr += (0).to_bytes(4, "little")  # fragment seq 0
    return bytes(hdr) + bytes(meta) + LOT_DATA


def aas(port, seq, payload):
    return bytes([port & 0xFF, port >> 8, seq & 0xFF, seq >> 8]) + payload


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "sample.cu8"
    title = sys.argv[2] if len(sys.argv) > 2 else "You're Listening to TPU"

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

    rng = np.random.default_rng(12345)
    n_frames = 3

    # program audio: tone mix, 32 HDC packets per P1 frame
    sr = C.SAMPLE_RATE_AUDIO
    n = n_frames * 32 * C.AUDIO_FRAME_SAMPLES
    t = np.arange(n) / sr
    land = 0.3 * np.sin(2 * np.pi * 440 * t) \
        + 0.15 * np.sin(2 * np.pi * 1320 * t) \
        + 0.1 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 2 * t)
    pcm = np.stack([land, 0.8 * land], axis=-1)
    enc = HDCEncoder(2)
    hdc = [enc.encode_frame(pcm[i * 2048:(i + 1) * 2048])
           for i in range(n_frames * 32)]

    psd = [aas_frame(0x5100, 0, id3(title)) + aas_frame(0x20, 0, sig_table()),
           aas_frame(SIG_PORT, 1, lot_fragment()),
           aas_frame(0x5100, 2, id3(title))]
    frames = [build_p1_fm_frame(hdc[f * 32:(f + 1) * 32], 0, f % 8,
                                (f * 32) % 64, psd[f])
              for f in range(n_frames)]
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(fr, pids) for fr in frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16), np.tile(np.arange(16), 3),
                             np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1, amplitude=0.15)
    sig = ch.impair(sig, sample_offset=1000, cfo_hz=100.0, snr_db=25.0,
                    rng=rng)
    ch.to_cu8(ch.upsample2(sig)).tofile(out)
    print(f"wrote {out} (title: {title!r}, LOT {LOT_NAME!r}, "
          f"{len(hdc)} audio packets)")


if __name__ == "__main__":
    main()
