"""Shared synthetic-capture builders for the session and reference
cross-check tests (truth harness: nrsc5_tpu/tx)."""

import numpy as np

from nrsc5_tpu import constants as C


def build_am_capture(rng, n_frames: int = 7, ma3: bool = False):
    """MA1/MA3 AM capture with 466-byte audio PDUs; returns
    (complex64 signal @ 46.5 kS/s, [(frame, [packet bytes])...])."""
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
    pids = np.stack([EAM.encode_pids_am(
        rng.integers(0, 2, 80).astype(np.uint8)) for _ in range(n_frames * 8)])
    psmi = C.SERVICE_MODE_MA3 if ma3 else C.SERVICE_MODE_MA1
    ref = np.stack([EAM.am_ref_bits(b % 8, psmi)
                    for b in range(n_frames * 8)])
    sig = modulate_am(mats, pids, ref, ma3)
    return sig, packets


def complex_to_cs16(sig: np.ndarray) -> bytes:
    """Complex baseband -> interleaved int16 Q15 bytes (reference cs16
    ingest format, src/input.c:119-124)."""
    out = np.empty(len(sig) * 2, np.int16)
    out[0::2] = np.clip(np.round(np.real(sig) * 32767), -32768, 32767)
    out[1::2] = np.clip(np.round(np.imag(sig) * 32767), -32768, 32767)
    return out.tobytes()
