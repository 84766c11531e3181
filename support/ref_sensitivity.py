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


def build_am(rng, snr_db):
    """Impaired MA1 cs16 capture + ground-truth packet set (frames 4-5,
    the fully-decodable window for both receivers)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from capture_helpers import build_am_capture, complex_to_cs16

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.tx import channel as ch

    sig, packets = build_am_capture(rng, n_frames=7, ma3=False)
    sig = ch.impair(sig, snr_db=snr_db,
                    sample_rate=C.SAMPLE_RATE_CS16_AM, rng=rng)
    # both receivers fully decode ~one frame in the 4-5 window (diversity
    # warm-up covers 0-3; the capture tail cuts the last frame): compare
    # recovery within that window
    want = {p for f, pk in packets if f in (4, 5) for p in pk}
    return complex_to_cs16(sig), want


def decode_reference_am(mod, data):
    got = set()

    def cb(t, e):
        if t == mod.EventType.HDC and e.program == 0 \
                and not (e.flags & mod.PacketFlags.CRC_ERROR):
            got.add(bytes(e.data))

    radio = mod.NRSC5(cb)
    radio.open_pipe()
    radio.set_mode(mod.Mode.AM)
    for i in range(0, len(data), 131072):
        radio.pipe_samples_cs16(data[i:i + 131072])
    radio.close()
    return got


def decode_framework_am(data):
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.api.session import MODE_AM, NRSC5

    got = set()

    def cb(e):
        if e.type == EventType.HDC and e.program == 0 and not e.crc_error:
            got.add(e.data)

    radio = NRSC5.open_pipe(cb, MODE_AM)
    buf = np.frombuffer(data, np.int16)
    for i in range(0, len(buf), 65536):
        radio.pipe_samples_cs16(buf[i:i + 65536])
    radio.flush()
    return got


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[-6, -4, -2, 0, 2, 6, 12])
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0xBE12)
    ap.add_argument("--am", action="store_true",
                    help="sweep the AM (MA1) chain instead of FM")
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
        if args.am:
            data, want = build_am(rng, snr)
            ours = decode_framework_am(data) & want
            ref = decode_reference_am(mod, data) & want if mod else set()
        else:
            cu8, packets = build_capture(rng, args.frames, snr)
            want = set(packets)
            ours = decode_framework(cu8) & want
            ref = decode_reference(mod, cu8) & want if mod else set()
        rows.append((snr, len(ours), len(ref), len(want)))
        print(f"{snr:>7.1f} | {len(ours):>9} | {len(ref):>9} | {len(want)}")
    return rows


if __name__ == "__main__":
    main()
