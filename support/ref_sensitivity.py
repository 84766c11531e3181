"""Sensitivity sweep: this framework vs the reference receiver binary.

Feeds BOTH receivers the IDENTICAL impaired cu8 capture at each SNR and
reports the fraction of ground-truth audio packets each recovers
(bit-exact HDC packet events).  The reference is built out-of-tree by
support/refbuild; the comparison is the framework's analog of a BER-vs-SNR
curve (the reference publishes none — SURVEY.md section 6).

Usage: python support/ref_sensitivity.py [--snrs -4 -2 0 2 6 12] [--frames 3]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_capture(rng, n_frames, snr_db):
    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.tx.transport_encoder import build_p1_fm_frame

    all_packets = []
    frames = []
    for f in range(n_frames):
        packets = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
                   for _ in range(32)]
        all_packets.extend(packets)
        frames.append(build_p1_fm_frame(packets, 0, f % 8, (f * 32) % 64))
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(fr, pids) for fr in frames]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:4 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16),
                             np.tile(np.arange(16), n_frames), np.arange(4)])
    sig = modulate_fm(matrix, bc_seq, 1, amplitude=0.15)
    sig = ch.impair(sig, sample_offset=1000, cfo_hz=100.0, snr_db=snr_db,
                    rng=rng)
    return ch.to_cu8(ch.upsample2(sig)), all_packets


def load_reference():
    from support.refbuild.build import build

    lib = build()
    if lib is None:
        return None
    path = os.path.join(os.environ.get("NRSC5_REFERENCE_DIR",
                                       "/root/reference"),
                        "support", "nrsc5.py")
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("ref_nrsc5", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import ctypes

    mod.NRSC5.libnrsc5 = ctypes.cdll.LoadLibrary(lib)
    return mod


def decode_reference(mod, cu8):
    got = set()

    def cb(t, e):
        if t == mod.EventType.HDC and e.program == 0 \
                and not (e.flags & mod.PacketFlags.CRC_ERROR):
            got.add(bytes(e.data))

    radio = mod.NRSC5(cb)
    radio.open_pipe()
    data = cu8.tobytes()
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cu8(data[i:i + 131072])
    radio.close()
    return got


def decode_framework(cu8):
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.api.session import MODE_FM, NRSC5

    got = set()

    def cb(e):
        if e.type == EventType.HDC and e.program == 0 and not e.crc_error:
            got.add(e.data)

    radio = NRSC5.open_pipe(cb, MODE_FM)
    for i in range(0, len(cu8), 131072):
        radio.pipe_samples_cu8(cu8[i:i + 131072])
    return got


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[-6, -4, -2, 0, 2, 6, 12])
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0xBE12)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    mod = load_reference()
    if mod is None:
        print("reference unavailable; framework-only sweep")

    print(f"{'SNR dB':>7} | {'framework':>9} | {'reference':>9} | packets")
    rows = []
    for snr in args.snrs:
        rng = np.random.default_rng(args.seed)
        cu8, packets = build_capture(rng, args.frames, snr)
        want = set(packets)
        ours = decode_framework(cu8) & want
        ref = decode_reference(mod, cu8) & want if mod else set()
        rows.append((snr, len(ours), len(ref), len(want)))
        print(f"{snr:>7.1f} | {len(ours):>9} | {len(ref):>9} | {len(want)}")
    return rows


if __name__ == "__main__":
    main()
