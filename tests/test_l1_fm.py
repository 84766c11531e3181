"""End-to-end FM layer-1 tests: modulator -> acquire -> sync -> decode."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.pipeline.receiver import FMReceiver
from nrsc5_tpu.tx import channel as ch
from nrsc5_tpu.tx.encoder import build_pm_matrix
from nrsc5_tpu.tx.modulator import modulate_fm


def _make_signal(rng, n_frames=1, psmi=1, lead_blocks=2, **impair_kw):
    """Build a capture: lead_blocks of warm-up blocks (bc wrapping) followed
    by n_frames full P1 frames, so the receiver can lock before frame 0."""
    p1_frames = rng.integers(0, 2, (n_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids_frames = rng.integers(0, 2, (n_frames, 16, C.PIDS_FRAME_LEN)).astype(np.uint8)

    mats = [build_pm_matrix(p1_frames[i], pids_frames[i]) for i in range(n_frames)]
    # warm-up: repeat the last lead_blocks blocks of a dummy frame so the
    # receiver sees bc = 16-lead_blocks .. 15 before the real frame starts
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    lead = dummy[(16 - lead_blocks) * 32:]
    trail = dummy[:2 * 32]  # keep the stream flowing past the last frame
    matrix = np.concatenate([lead] + mats + [trail])
    bc_seq = np.concatenate([np.arange(16 - lead_blocks, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, psmi)
    sig = ch.impair(sig, **impair_kw)
    return sig, p1_frames, pids_frames


class Collector:
    def __init__(self):
        self.p1 = []
        self.pids = []
        self.px1 = []
        self.events = []

    def on_frame(self, chan, bits, margin):
        if chan == -1:
            self.pids.append(bits)
        elif chan == 0:
            self.p1.append(bits)
        elif chan == 1:
            self.px1.append(bits)

    def on_event(self, kind, info):
        self.events.append((kind, info))


@pytest.mark.parametrize("impair_kw", [
    dict(),
    dict(sample_offset=777),
    dict(cfo_hz=400.0),
    dict(snr_db=25.0),
    dict(sample_offset=12345, cfo_hz=-250.0, snr_db=22.0),
])
def test_fm_p1_pids_roundtrip(rng, impair_kw):
    sig, p1_frames, pids_frames = _make_signal(rng, n_frames=1, **impair_kw)
    col = Collector()
    rx = FMReceiver(col.on_frame, col.on_event)
    rx.push_cs16(sig)

    assert ("sync", {"psmi": 1}) in col.events
    assert len(col.p1) >= 1, "no P1 frame decoded"
    assert np.array_equal(col.p1[-1], p1_frames[0])
    # all 16 PIDS frames of the real frame should be among the decoded ones
    decoded = {bytes(np.packbits(p)) for p in col.pids}
    want = {bytes(np.packbits(pids_frames[0][i])) for i in range(16)}
    missing = want - decoded
    assert not missing, f"missing {len(missing)} PIDS frames"


def test_fm_mp3_px1_roundtrip(rng):
    """Service mode MP3 (cm=3): P1 + PX1 (P3, interleaver-IV) end to end.

    One interleaver-IV cycle spans 32 L1 blocks; its frames surface one
    full cycle later, so the capture carries two cycles."""
    from nrsc5_tpu.tx.encoder import build_px_stream

    psmi = 3
    n_cycles = 2
    p3_frames = rng.integers(
        0, 2, (n_cycles, 16, C.P3_FRAME_LEN_MP3_MP11)).astype(np.uint8)

    mats = []
    for cyc in range(n_cycles):
        for half in range(2):  # 2 P1 frames per IV cycle
            p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
            pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
            mats.append(build_pm_matrix(p1, pids))
    stream = build_px_stream(p3_frames, C.P3_FRAME_LEN_MP3_MP11)
    px_parts = [stream.reshape(n_cycles * 32 * C.BLKSZ, -1)]

    lead_blocks = 2
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate([dummy[(16 - lead_blocks) * 32:]] + mats
                            + [dummy[:2 * 32]])
    px_all = np.concatenate([np.ones((lead_blocks * 32,
                                      px_parts[0].shape[1]), np.int8)]
                            + px_parts
                            + [np.ones((2 * 32, px_parts[0].shape[1]),
                                       np.int8)])
    bc_seq = np.concatenate([np.arange(16 - lead_blocks, 16),
                             np.tile(np.arange(16), 2 * n_cycles),
                             np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px_all)
    sig = ch.impair(sig, snr_db=25.0, rng=rng)

    col = Collector()
    rx = FMReceiver(col.on_frame, col.on_event)
    rx.push_cs16(sig)

    assert ("sync", {"psmi": psmi}) in col.events
    got = {b.tobytes() for b in col.px1}
    # the ready gate discards cycle 0; every frame of cycle 1 must decode
    missing = sum(p3_frames[1][i].astype(np.uint8).tobytes() not in got
                  for i in range(16))
    assert missing == 0, f"{missing}/16 P3 frames missing"


def test_fm_mp11_px1_px2_roundtrip(rng):
    """Service mode MP11 (cm=11): widest FM mode, P1 + PX1 + PX2."""
    from nrsc5_tpu.tx.encoder import build_px_stream

    psmi = 11
    n_cycles = 2
    fl = C.P3_FRAME_LEN_MP3_MP11
    p3 = rng.integers(0, 2, (n_cycles, 16, fl)).astype(np.uint8)
    p4 = rng.integers(0, 2, (n_cycles, 16, fl)).astype(np.uint8)

    mats = []
    for _ in range(n_cycles * 2):
        p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
        pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
        mats.append(build_pm_matrix(p1, pids))
    px1_all = build_px_stream(p3, fl).reshape(n_cycles * 32 * C.BLKSZ, -1)
    px2_all = build_px_stream(p4, fl, rng=np.random.default_rng(77)) \
        .reshape(n_cycles * 32 * C.BLKSZ, -1)

    lead, trail = 2, 2
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate([dummy[(16 - lead) * 32:]] + mats
                            + [dummy[:trail * 32]])
    pad = np.ones((lead * 32, px1_all.shape[1]), np.int8)
    pad_t = np.ones((trail * 32, px1_all.shape[1]), np.int8)
    px1_all = np.concatenate([pad, px1_all, pad_t])
    px2_all = np.concatenate([pad, px2_all, pad_t])
    bc_seq = np.concatenate([np.arange(16 - lead, 16),
                             np.tile(np.arange(16), 2 * n_cycles),
                             np.arange(trail)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px1_all,
                      px2_signs=px2_all)
    sig = ch.impair(sig, snr_db=25.0, rng=rng)

    col = Collector()
    col.px2 = []
    col_on = col.on_frame

    def on_frame(chan, bits, margin):
        if chan == 2:
            col.px2.append(bits)
        else:
            col_on(chan, bits, margin)

    rx = FMReceiver(on_frame, col.on_event)
    rx.push_cs16(sig)

    assert ("sync", {"psmi": psmi}) in col.events
    got1 = {b.tobytes() for b in col.px1}
    got2 = {b.tobytes() for b in col.px2}
    miss1 = sum(p3[1][i].tobytes() not in got1 for i in range(16))
    miss2 = sum(p4[1][i].tobytes() not in got2 for i in range(16))
    assert miss1 == 0, f"{miss1}/16 PX1 frames missing"
    assert miss2 == 0, f"{miss2}/16 PX2 frames missing"


def test_fm_mp2_px1_roundtrip(rng):
    """Service mode MP2 (cm=2): one extended partition per sideband,
    P3 frames of 2304 bits through the J=2 interleaver-IV."""
    from nrsc5_tpu.tx.encoder import build_px_stream

    psmi = 2
    n_cycles = 2
    fl = C.P3_FRAME_LEN_MP2
    p3 = rng.integers(0, 2, (n_cycles, 16, fl)).astype(np.uint8)

    mats = []
    for _ in range(n_cycles * 2):
        mats.append(build_pm_matrix(
            rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
            rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)))
    px1_all = build_px_stream(p3, fl).reshape(n_cycles * 32 * C.BLKSZ, -1)

    lead, trail = 2, 2
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate([dummy[(16 - lead) * 32:]] + mats
                            + [dummy[:trail * 32]])
    pad = np.ones((lead * 32, px1_all.shape[1]), np.int8)
    pad_t = np.ones((trail * 32, px1_all.shape[1]), np.int8)
    px1_all = np.concatenate([pad, px1_all, pad_t])
    bc_seq = np.concatenate([np.arange(16 - lead, 16),
                             np.tile(np.arange(16), 2 * n_cycles),
                             np.arange(trail)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px1_all)
    sig = ch.impair(sig, snr_db=25.0, rng=rng)

    col = Collector()
    rx = FMReceiver(col.on_frame, col.on_event)
    rx.push_cs16(sig)

    assert ("sync", {"psmi": psmi}) in col.events
    got = {b.tobytes() for b in col.px1}
    missing = sum(p3[1][i].tobytes() not in got for i in range(16))
    assert missing == 0, f"{missing}/16 MP2 P3 frames missing"


def test_fm_mp3_iv_midcycle_lock(rng):
    """Interleaver-IV is anchor-phase invariant under a mid-cycle lock.

    The capture carries ONE junk P1 frame before the PX cycle stream, so the
    receiver's bc==0 anchor lands half a 2-frame IV cycle off the TX phase.
    The deinterleave still reproduces every complete P3 frame after one
    warm-up cycle (frames are only phase-relabeled), so no recovery logic is
    needed — this pins that property (the reference, src/decode.c:344-376,
    never handles a mid-cycle lock explicitly either)."""
    from nrsc5_tpu.tx.encoder import build_px_stream

    psmi = 3
    n_cycles = 3
    fl = C.P3_FRAME_LEN_MP3_MP11
    p3_frames = rng.integers(0, 2, (n_cycles, 16, fl)).astype(np.uint8)

    mats = []
    for _ in range(1 + n_cycles * 2):  # 1 filler P1 frame + cycle frames
        p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
        pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
        mats.append(build_pm_matrix(p1, pids))
    stream = build_px_stream(p3_frames, fl)
    sview = stream.reshape(n_cycles * 32 * C.BLKSZ, -1)
    width = sview.shape[1]

    lead_blocks = 2
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate([dummy[(16 - lead_blocks) * 32:]] + mats
                            + [dummy[:2 * 32]])
    junk = rng.choice(np.array([-1, 1], np.int8),
                      ((lead_blocks + 16) * 32, width))
    trail = rng.choice(np.array([-1, 1], np.int8), (2 * 32, width))
    px_all = np.concatenate([junk, sview, trail])
    bc_seq = np.concatenate([np.arange(16 - lead_blocks, 16),
                             np.tile(np.arange(16), 1 + 2 * n_cycles),
                             np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px_all)
    sig = ch.impair(sig, snr_db=25.0, rng=rng)

    col = Collector()
    rx = FMReceiver(col.on_frame, col.on_event)
    rx.push_cs16(sig)

    assert ("sync", {"psmi": psmi}) in col.events
    got = {b.tobytes() for b in col.px1}
    for cyc in (1, 2):  # cycle 0 is warm-up (mixed with the junk filler)
        missing = sum(p3_frames[cyc][i].tobytes() not in got
                      for i in range(16))
        assert missing == 0, f"{missing}/16 cycle-{cyc} frames missing"


@pytest.mark.parametrize("psmi", [5, 6])
def test_fm_mp5_mp6_pm_roundtrip(rng, psmi):
    """Service modes MP5/MP6 (cm 5/6): 14 equalized partitions per sideband,
    PM decoded, extended content carried but not decoded — matching the
    reference's treatment (src/sync.c:343-357: partitions_per_band=14, no
    PX slicing for these modes).  The extended partitions carry random
    filler occupancy so the equalizer sees a realistic full-band signal."""
    n_frames = 1
    p1_frames = rng.integers(0, 2, (n_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids_frames = rng.integers(0, 2, (n_frames, 16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    mats = [build_pm_matrix(p1_frames[f], pids_frames[f])
            for f in range(n_frames)]
    lead_blocks = 2
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate([dummy[(16 - lead_blocks) * 32:]] + mats
                            + [dummy[:2 * 32]])
    bc_seq = np.concatenate([np.arange(16 - lead_blocks, 16),
                             np.tile(np.arange(16), n_frames),
                             np.arange(2)])
    n_ext = C.partitions_per_band(psmi) - C.PM_PARTITIONS
    ext = rng.choice(np.array([-1, 1], np.int8),
                     (len(matrix), 2 * n_ext * C.PARTITION_DATA_CARRIERS * 2))
    sig = modulate_fm(matrix, bc_seq, psmi, ext_signs=ext)
    sig = ch.impair(sig, sample_offset=777, cfo_hz=250.0, snr_db=22.0,
                    rng=rng)

    col = Collector()
    rx = FMReceiver(col.on_frame, col.on_event)
    rx.push_cs16(sig)

    assert ("sync", {"psmi": psmi}) in col.events
    assert len(col.p1) >= 1, "no P1 frame decoded"
    assert np.array_equal(col.p1[-1], p1_frames[0])
    decoded = {bytes(np.packbits(p)) for p in col.pids}
    want = {bytes(np.packbits(pids_frames[0][i])) for i in range(16)}
    assert not (want - decoded), "PIDS frames missing"
    assert not col.px1, "cm 5/6 must not emit PX frames"
