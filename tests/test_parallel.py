"""Sharded receive over a virtual (station, time) CPU mesh."""

import jax
import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.parallel import receive as pr
from nrsc5_tpu.tx.encoder import build_pm_matrix
from nrsc5_tpu.tx.modulator import modulate_fm


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_fm_chain(rng):
    n_time, n_station, n_blocks = 2, 2, 16
    n_frames = n_time  # one frame per time shard
    p1 = rng.integers(0, 2, (n_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids = rng.integers(0, 2,
                        (n_frames, 16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    mats = [build_pm_matrix(p1[i], pids[i]) for i in range(n_frames)]
    trail = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))[:32]
    matrix = np.concatenate(mats + [trail])
    bc_seq = np.concatenate([np.tile(np.arange(16), n_frames), [0]])
    sig = modulate_fm(matrix, bc_seq, 1)

    chunk = pr.shard_chunk_len(n_blocks)
    total = n_time * chunk
    buf = np.zeros(total + pr.HALO, np.complex64)
    start = C.FFTCP_FM // 2
    need = total + pr.HALO - start
    buf[start:] = sig[:need]

    samples = np.stack([buf[:total]] * n_station)
    tails = np.stack([buf[total:]] * n_station)

    mesh = pr.make_mesh(n_station, n_time)
    step = pr.sharded_fm_chain(mesh, n_blocks, psmi=1)
    p1_out, margin, pids_out, quality = step(samples, tails)

    assert p1_out.shape == (n_station, n_time, C.P1_FRAME_LEN_FM)
    for s in range(n_station):
        for f in range(n_frames):
            assert np.array_equal(np.asarray(p1_out[s, f]), p1[f]), (s, f)
    pids_out = np.asarray(pids_out).reshape(n_station, n_time * n_blocks, -1)
    for s in range(n_station):
        for f in range(n_frames):
            got = pids_out[s, f * 16:(f + 1) * 16]
            assert np.array_equal(got, pids[f])
    assert float(quality) < 0.05  # clean link: tiny EVM power


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_replay_capture_transport(rng):
    """Sharded decode + host transport merge: HDC packets and ID3 titles
    come out of a mesh-decoded multi-station capture."""
    from nrsc5_tpu.api.events import EventType
    from nrsc5_tpu.parallel import replay as rp
    from nrsc5_tpu.tx.transport_encoder import aas_frame, build_p1_fm_frame

    def id3(title):
        fr = b"TIT2" + (len(title) + 1).to_bytes(4, "big") + b"\x00\x00" \
            + b"\x00" + title.encode()
        size = len(fr)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        return b"ID3\x03\x00\x00" + ss + fr

    n_time, n_station, n_blocks = 2, 2, 16
    packets, p1_frames = [], []
    for f in range(n_time):
        pk = [rng.integers(0, 256, 300).astype(np.uint8).tobytes()
              for _ in range(32)]
        packets.append(pk)
        p1_frames.append(build_p1_fm_frame(
            pk, 0, f % 8, (f * 32) % 64, aas_frame(0x5100, f, id3("MeshFM"))))
    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(p1_frames[f], pids) for f in range(n_time)]
    trail = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)[:32]
    matrix = np.concatenate(mats + [trail])
    bc_seq = np.concatenate([np.tile(np.arange(16), n_time), [0]])
    sig = modulate_fm(matrix, bc_seq, 1)

    chunk = pr.shard_chunk_len(n_blocks)
    total = n_time * chunk
    buf = np.zeros(total + pr.HALO, np.complex64)
    start = C.FFTCP_FM // 2
    buf[start:] = sig[:total + pr.HALO - start]
    samples = np.stack([buf[:total]] * n_station)
    tails = np.stack([buf[total:]] * n_station)

    mesh = pr.make_mesh(n_station, n_time)
    sinks, quality = rp.replay_capture(samples, tails, mesh, n_blocks)
    assert len(sinks) == n_station
    want = {p for pk in packets for p in pk[:32]}
    for sink in sinks:
        hdc = {e.data for e in sink.events if e.type == EventType.HDC
               and not e.crc_error}
        # frame 0's packets pop during frame 1's blocks
        got0 = sum(p in hdc for p in packets[0])
        assert got0 == 32, f"{got0}/32 frame-0 packets"
        titles = [e.title for e in sink.events if e.type == EventType.ID3]
        assert "MeshFM" in titles


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_am_chain(rng):
    """AM chain over the (station, time) mesh with 3-frame shard overlap."""
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am

    n_station, n_time, n_frames = 2, 2, 7
    # continuous capture: 7 frames; shard 0 sees frames 0-6? No — each
    # shard gets n_frames consecutive frames; total = n_time*n_frames with
    # 0 overlap here, so only frames 3..6 of each shard's chunk validate.
    total_frames = n_time * n_frames
    p1 = rng.integers(0, 2, (total_frames, 8, C.P1_FRAME_LEN_AM)) \
        .astype(np.uint8)
    p3 = rng.integers(0, 2, (total_frames, C.P3_FRAME_LEN_MA1)) \
        .astype(np.uint8)
    mats = EAM.interleave_frames(
        [EAM.encode_p1_am(p1[f]) for f in range(total_frames)],
        [EAM.encode_p3_am(p3[f], False) for f in range(total_frames)], False)
    pids = np.stack([EAM.encode_pids_am(
        rng.integers(0, 2, 80).astype(np.uint8))
        for _ in range(total_frames * 8)])
    ref = np.stack([EAM.am_ref_bits(b % 8, 1)
                    for b in range(total_frames * 8)])
    sig = modulate_am(mats, pids, ref, False)

    chunk = pr.shard_chunk_len_am(n_frames)
    total = n_time * chunk
    buf = np.zeros(total + pr.HALO_AM, np.complex64)
    start = C.FFTCP_AM // 2
    n = min(len(sig) - 0, total + pr.HALO_AM - start)
    buf[start:start + n] = sig[:n]
    samples = np.stack([buf[:total]] * n_station)
    tails = np.stack([buf[total:]] * n_station)

    mesh = pr.make_mesh(n_station, n_time)
    step = pr.sharded_am_chain(mesh, n_frames, False)
    p1_out, p3_out, pids_out = step(samples, tails)
    p1_out = np.asarray(p1_out)  # [S, n_time*n_frames, 8, 3750]
    # shard t decodes its local frames 3..n_frames-1 == global frames
    # t*n_frames+3 .. t*n_frames+n_frames-1 (diversity warm-up per shard)
    for s in range(n_station):
        for t in range(n_time):
            for f in range(3, n_frames - (1 if t == n_time - 1 else 0)):
                g = t * n_frames + f
                assert np.array_equal(p1_out[s, g], p1[g]), (s, t, f)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_fm_chain_selfsync(rng):
    """Time shards cold-start themselves on device: the capture has an
    unknown sample offset AND integer+fractional CFO, no host
    pre-alignment — every shard must lock and decode bit-exact P1 frames
    (round-1 VERDICT item 4)."""
    from nrsc5_tpu.tx import channel as ch

    n_time, n_station, n_blocks = 2, 2, 33
    total_frames = 5  # ~2.5 per shard: F=1 complete frame each, anywhere
    p1 = rng.integers(0, 2,
                      (total_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids = np.zeros((16, C.PIDS_FRAME_LEN), np.uint8)
    mats = [build_pm_matrix(p1[i], pids) for i in range(total_frames)]
    matrix = np.concatenate(mats)
    bc_seq = np.tile(np.arange(16), total_frames)
    sig = modulate_fm(matrix, bc_seq, 1)
    bin_hz = C.SAMPLE_RATE_CS16_FM / C.FFT_FM
    sig = ch.impair(sig, cfo_hz=3 * bin_hz + 25.0, snr_db=28.0, rng=rng)

    chunk = pr.shard_chunk_len(n_blocks)
    total = n_time * chunk
    halo = pr.selfsync_halo()
    buf = np.zeros(total + halo, np.complex64)
    off0 = 947  # unknown-to-the-receiver initial offset
    buf[off0:off0 + min(len(sig), total + halo - off0)] = \
        sig[:total + halo - off0]
    rcbuf = np.stack([buf.real, -buf.imag], -1).astype(np.float32)

    samples = np.stack([rcbuf[:total]] * n_station)
    tails = np.stack([rcbuf[total:total + halo]] * n_station)

    mesh = pr.make_mesh(n_station, n_time)
    step = pr.sharded_fm_chain_selfsync(mesh, n_blocks, psmi=1)
    p1_out, margin, first_bc, cfo, locked, quality = step(samples, tails)
    assert np.asarray(locked).all(), f"shards not locked: {locked}"
    assert (np.abs(np.asarray(cfo)) == 3).all(), f"cfo: {cfo}"

    want = {p1[i].tobytes() for i in range(total_frames)}
    got_all = np.asarray(p1_out)  # [S, n_time*F, len]
    for s in range(n_station):
        got = {got_all[s, i].tobytes() for i in range(got_all.shape[1])}
        assert got <= want | got, "shape sanity"
        assert got & want, f"station {s}: no bit-exact frame"
        assert len(got & want) == got_all.shape[1], \
            f"station {s}: {len(got & want)}/{got_all.shape[1]} exact"


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_pipelined_receive_bit_exact(rng):
    """Pipeline (stage) parallelism: the frontend|FEC 2-stage pipeline
    (SURVEY §2 parallelism item 4) reproduces the fused single-device
    chain bit-exactly, including the carried frontend state."""
    from nrsc5_tpu.parallel import pipeline as pp
    from nrsc5_tpu.pipeline import scan_chain as sc

    n_frames = 3
    p1 = rng.integers(0, 2, (n_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids = rng.integers(0, 2,
                        (n_frames, 16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    mats = [build_pm_matrix(p1[i], pids[i]) for i in range(n_frames)]
    matrix = np.concatenate(mats)
    bc_seq = np.tile(np.arange(16), n_frames)
    sig = modulate_fm(matrix, bc_seq, 1)

    buf = np.zeros(sc.buffer_len(16 * n_frames), np.complex64)
    start = C.FFTCP_FM // 2
    buf[start:start + len(sig)] = sig
    samples = jax.numpy.asarray(buf)

    mesh = pp.make_stage_mesh()
    out, carry = pp.pipelined_receive(samples, sc.chain_init_carry(),
                                      n_frames, mesh)

    ref_out, ref_carry = sc.fm_chain_scan(samples, sc.chain_init_carry(),
                                          16 * n_frames, 1, 0)
    for f in range(n_frames):
        assert np.array_equal(np.asarray(out["p1"][f]), p1[f]), f
        assert np.array_equal(np.asarray(out["p1"][f]),
                              np.asarray(ref_out["p1"][f])), f
        assert np.array_equal(np.asarray(out["pids"][f]), pids[f]), f
    assert int(np.asarray(carry.offset)) == int(
        np.asarray(ref_carry.offset))
