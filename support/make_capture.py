"""Generate a golden FM cu8 capture for the CLI end-to-end check.

The reference CI decodes support/sample.xz and greps for its ID3 title
(.github/workflows/ci.yml:30-42); that capture is not redistributable, so
CI here generates an equivalent one with the truth harness and asserts the
same observable behavior.

Usage: python support/make_capture.py OUT.cu8 [title]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

    rng = np.random.default_rng(12345)

    def id3(text):
        fr = b"TIT2" + (len(text) + 1).to_bytes(4, "big") + b"\x00\x00" \
            + b"\x00" + text.encode("latin-1")
        size = len(fr)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        return b"ID3\x03\x00\x00" + ss + fr

    frames = []
    for f in range(3):
        packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                   for _ in range(32)]
        frames.append(build_p1_fm_frame(
            packets, 0, f % 8, (f * 32) % 64,
            aas_frame(0x5100, f, id3(title))))
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
    print(f"wrote {out} (title: {title!r})")


if __name__ == "__main__":
    main()
