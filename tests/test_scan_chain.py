"""Tests for the fused steady-state scan chain (pipeline/scan_chain.py)."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.pipeline import scan_chain as sc
from nrsc5_tpu.tx import channel as ch
from nrsc5_tpu.tx.encoder import build_pm_matrix
from nrsc5_tpu.tx.modulator import modulate_fm


def _steady_signal(rng, n_frames=1, lead_blocks=1, snr_db=None):
    """A capture framed the way the FINE chain expects: the first OFDM
    symbol starts FFTCP//2 samples into the buffer, block counts run
    16-lead_blocks..15 then 0..15 per frame."""
    p1 = rng.integers(0, 2, (n_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids = rng.integers(0, 2,
                        (n_frames, 16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    mats = [build_pm_matrix(p1[i], pids[i]) for i in range(n_frames)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    lead = dummy[(16 - lead_blocks) * 32:]
    matrix = np.concatenate([lead] + mats)
    bc_seq = np.concatenate([np.arange(16 - lead_blocks, 16),
                             np.tile(np.arange(16), n_frames)])
    sig = modulate_fm(matrix, bc_seq, 1)
    if snr_db is not None:
        sig = ch.impair(sig, snr_db=snr_db, rng=rng)
    n_blocks = lead_blocks + 16 * n_frames
    buf = np.zeros(sc.buffer_len(n_blocks), np.complex64)
    start = C.FFTCP_FM // 2
    buf[start:start + len(sig)] = sig
    return buf, p1, pids, n_blocks, 16 - lead_blocks


@pytest.mark.parametrize("snr_db", [None, 22.0])
def test_fm_chain_scan_roundtrip(rng, snr_db):
    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng, snr_db=snr_db)
    out, carry = sc.fm_chain_scan(buf, sc.chain_init_carry(), n_blocks,
                                  psmi=1, first_bc=first_bc)
    assert out["p1"].shape == (1, C.P1_FRAME_LEN_FM)
    assert np.array_equal(np.asarray(out["p1"][0]), p1[0])
    got = np.asarray(out["pids"])[1:]  # blocks 1..16 are the real frame
    assert np.array_equal(got, pids[0])
    # clock stays locked: per-block timing error stays tiny on a clean link
    assert np.abs(np.asarray(out["diag"]["samperr"])).max() <= 2


def test_fm_chain_batch(rng):
    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng)
    import jax
    import jax.numpy as jnp
    s = 3
    bufs = jnp.asarray(np.stack([buf] * s))
    carries = jax.tree.map(lambda x: jnp.stack([x] * s),
                           sc.chain_init_carry())
    out, _ = sc.fm_chain_batch(bufs, carries, n_blocks, 1, first_bc)
    for i in range(s):
        assert np.array_equal(np.asarray(out["p1"][i, 0]), p1[0])


def test_am_chain_scan(rng):
    """Fused AM chain matches the truth harness in steady state."""
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_am as sca
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am

    n = 6
    p1 = rng.integers(0, 2, (n, 8, C.P1_FRAME_LEN_AM)).astype(np.uint8)
    p3 = rng.integers(0, 2, (n, C.P3_FRAME_LEN_MA1)).astype(np.uint8)
    mats = EAM.interleave_frames(
        [EAM.encode_p1_am(p1[f]) for f in range(n)],
        [EAM.encode_p3_am(p3[f], False) for f in range(n)], False)
    pids_bits = rng.integers(0, 2, (n * 8, C.PIDS_FRAME_LEN)).astype(np.uint8)
    pids_codes = np.stack([EAM.encode_pids_am(p) for p in pids_bits])
    ref = np.stack([EAM.am_ref_bits(b % 8, 1) for b in range(n * 8)])
    sig = modulate_am(mats, pids_codes, ref, False)

    buf = np.zeros(sca.am_buffer_len(n), np.complex64)
    start = C.FFTCP_AM // 2
    buf[start:start + len(sig)] = sig
    out, carry = sca.am_chain_scan(jnp.asarray(buf),
                                   sca.am_chain_init_carry(), n, False)
    # frames 3..n-1 are past diversity warm-up
    for f in range(3, n):
        assert np.array_equal(np.asarray(out["p1"][f]), p1[f]), f
        assert np.array_equal(np.asarray(out["p3"][f]), p3[f]), f
    assert np.array_equal(np.asarray(out["pids"]), pids_bits)


def test_checkpoint_resume(rng):
    """Carried-state checkpoint at a block boundary resumes bit-exactly."""
    import tempfile, os
    import jax.numpy as jnp
    from nrsc5_tpu.utils.checkpoint import load_state, save_state

    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng)
    # run the full 17 blocks in one go
    out_full, _ = sc.fm_chain_scan(jnp.asarray(buf), sc.chain_init_carry(),
                                   n_blocks, 1, first_bc)
    # run 1 block, checkpoint, resume for the remaining 16
    first = sc.buffer_len(1)
    out1, carry1 = sc.fm_chain_scan(jnp.asarray(buf[:first]),
                                    sc.chain_init_carry(), 1, 1, first_bc)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "carry.npz")
        save_state(path, carry1)
        carry1b = load_state(path, sc.chain_init_carry())
    # resume: offset is relative to the same buffer
    out2, _ = sc.fm_chain_scan(jnp.asarray(buf), carry1b, n_blocks - 1, 1,
                               (first_bc + 1) % 16)
    assert np.array_equal(np.asarray(out2["p1"][0]), p1[0])
    assert np.array_equal(np.asarray(out2["p1"][0]),
                          np.asarray(out_full["p1"][0]))


def test_streaming_buffers(rng):
    """Chained fm_chain_scan calls over consecutive buffers (the streaming
    production pattern) decode identically to one big buffer."""
    import jax.numpy as jnp

    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng, n_frames=2,
                                                       lead_blocks=1)
    # one-shot reference
    out_ref, _ = sc.fm_chain_scan(jnp.asarray(buf), sc.chain_init_carry(),
                                  n_blocks, 1, first_bc)

    # stream in two chunks of blocks
    n1 = 17  # lead + first frame
    n2 = n_blocks - n1
    b1 = jnp.asarray(buf[:sc.buffer_len(n1)])
    out1, carry = sc.fm_chain_scan(b1, sc.chain_init_carry(), n1, 1, first_bc)
    consumed = int(np.asarray(carry.offset))
    carry2 = sc.rebase_carry(carry, consumed)
    b2 = jnp.asarray(buf[consumed:consumed + sc.buffer_len(n2)].copy())
    out2, _ = sc.fm_chain_scan(b2, carry2, n2, 1,
                               (first_bc + n1) % 16)
    assert np.array_equal(np.asarray(out1["p1"][0]), p1[0])
    assert np.array_equal(np.asarray(out2["p1"][0]), p1[1])
    assert np.array_equal(np.asarray(out_ref["p1"]),
                          np.concatenate([np.asarray(out1["p1"]),
                                          np.asarray(out2["p1"])]))


def test_rc_chain_matches_complex(rng):
    """The real-valued chain must reproduce the complex chain's decode
    (bit-exact frames; soft bits may differ by float rounding)."""
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc

    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng, snr_db=24.0)
    out_c, _ = sc.fm_chain_scan(jnp.asarray(buf), sc.chain_init_carry(),
                                n_blocks, 1, first_bc)

    buf_rc = jnp.asarray(
        np.stack([buf.real, -buf.imag], axis=-1).astype(np.float32))
    out_r, carry = rcc.fm_chain_scan_rc(buf_rc, rcc.chain_rc_init_carry(),
                                        n_blocks, 1, first_bc)
    assert np.array_equal(np.asarray(out_r["p1"][0]), p1[0])
    assert np.array_equal(np.asarray(out_r["p1"]), np.asarray(out_c["p1"]))
    assert np.array_equal(np.asarray(out_r["pids"]),
                          np.asarray(out_c["pids"]))
    # clock estimates agree
    assert np.abs(np.asarray(out_r["diag"]["samperr"])
                  - np.asarray(out_c["diag"]["samperr"])).max() <= 1


def test_rc_coarse_and_cfo_probe_match_complex(rng):
    """coarse_timing_rc / detect_cfo_scan_rc must agree with the complex
    implementations on an impaired capture."""
    import jax.numpy as jnp
    from nrsc5_tpu.ops import acquire as AQ
    from nrsc5_tpu.ops import acquire_rc as AQR
    from nrsc5_tpu.ops.detect_cfo import detect_cfo_scan

    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng)
    sig = ch.impair(buf[:AQ.WINDOW_FM + 4000], sample_offset=1357,
                    snr_db=25.0, rng=rng)
    cbuf = np.conj(sig[:AQ.WINDOW_FM]).astype(np.complex64)
    samperr_c, max_c = AQ._coarse_timing(jnp.asarray(cbuf))
    rcw = jnp.asarray(np.stack([cbuf.real, cbuf.imag], -1)
                      .astype(np.float32))
    samperr_r, max_r = AQR.coarse_timing_rc(rcw)
    assert int(samperr_c) == int(samperr_r)
    assert abs(complex(np.asarray(max_c))
               - complex(np.asarray(max_r)[0]
                         + 1j * np.asarray(max_r)[1])) < 1e-2 * abs(
        complex(np.asarray(max_c)))

    # CFO scan on demodulated spectra
    unit = jnp.asarray(np.array([1.0, 0.0], np.float32))
    spectra_rc, _, _, _ = AQR.demod_rc(
        rcw, unit, samperr_r, jnp.asarray(0.0, jnp.float32),
        jnp.asarray(0, jnp.int32))
    sp_c = np.asarray(spectra_rc[..., 0]) + 1j * np.asarray(
        spectra_rc[..., 1])
    count_c = np.asarray(detect_cfo_scan(jnp.asarray(
        sp_c.astype(np.complex64))))
    count_r = np.asarray(AQR.detect_cfo_scan_rc(spectra_rc))
    assert np.array_equal(count_c, count_r)


def test_rc_cold_start_decode(rng):
    """Cold start from a capture with unknown timing, integer + fractional
    CFO: the two-probe cold start locks and the fused rc chain decodes
    bit-exactly (the accelerator-path analog of the NONE→COARSE→FINE
    machine; reference: src/acquire.c:129-151, src/sync.c:292-337)."""
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc

    buf, p1, pids, n_blocks, first_bc = _steady_signal(rng, n_frames=2,
                                                       lead_blocks=2)
    bin_hz = C.SAMPLE_RATE_CS16_FM / C.FFT_FM
    sig = ch.impair(buf, sample_offset=2789, cfo_hz=5 * bin_hz + 41.0,
                    snr_db=25.0, rng=rng)
    rcs = jnp.asarray(np.stack([sig.real, -sig.imag], -1)
                      .astype(np.float32))

    lock = rcc.cold_start_rc(rcs)
    assert lock is not None, "cold start failed to lock"
    assert abs(lock["cfo"]) == 5, f"CFO {lock['cfo']} != ±5 bins"
    assert lock["psmi"] == 1

    # run the chain from the locked offset; decode what fits
    avail = rcs.shape[0] - lock["offset"]
    blocks = min((int(avail) - C.FFTCP_FM - rcc.SLACK)
                 // (C.BLKSZ * C.FFTCP_FM), 32)
    out, _ = rcc.fm_chain_scan_rc(rcs[lock["offset"]:],
                                  lock["carry"], blocks,
                                  lock["psmi"], lock["first_bc"])
    assert "p1" in out and out["p1"].shape[0] >= 1
    got = {np.asarray(out["p1"][i]).tobytes()
           for i in range(out["p1"].shape[0])}
    want = {p1[i].tobytes() for i in range(2)}
    assert got & want, "no bit-exact P1 frame after cold start"


def test_rc_chain_px_mp3(rng):
    """MP3 (cm=3) through the fused rc chain: P1 + PX1 decoded on device
    with carried interleaver-IV state; cycle-1 P3 frames bit-exact."""
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.tx.encoder import build_px_stream

    psmi = 3
    n_cycles = 2
    fl = C.P3_FRAME_LEN_MP3_MP11
    p3 = rng.integers(0, 2, (n_cycles, 16, fl)).astype(np.uint8)

    mats, p1s = [], []
    for _ in range(n_cycles * 2):
        p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
        pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
        p1s.append(p1)
        mats.append(build_pm_matrix(p1, pids))
    px = build_px_stream(p3, fl).reshape(n_cycles * 32 * C.BLKSZ, -1)

    trail = 16  # half a cycle feeds the IV read-out of cycle 1
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate(mats + [dummy[:trail * 32]])
    px_all = np.concatenate(
        [px, np.ones((trail * 32, px.shape[1]), np.int8)])
    bc_seq = np.concatenate([np.tile(np.arange(16), n_cycles * 2),
                             np.arange(trail)])
    sig = modulate_fm(matrix, bc_seq, psmi, px1_signs=px_all)

    n_blocks = n_cycles * 32 + trail
    buf = np.zeros((sc.buffer_len(n_blocks), 2), np.float32)
    start = C.FFTCP_FM // 2
    buf[start:start + len(sig), 0] = sig.real
    buf[start:start + len(sig), 1] = -sig.imag

    out, carry = rcc.fm_chain_scan_rc(
        jnp.asarray(buf), rcc.chain_rc_init_carry(psmi=psmi), n_blocks,
        psmi, 0)
    # P1 (frames 1+ — frame 0 covers the Costas cold lock)
    for i in range(1, 4):
        assert np.array_equal(np.asarray(out["p1"][i]), p1s[i]), \
            f"P1 frame {i}"
    # PX1: cycle-1 frames must surface bit-exact among the decoded calls
    got = {np.asarray(out["px1"][i]).tobytes()
           for i in range(out["px1"].shape[0])}
    hits = sum(p3[1][i].tobytes() in got for i in range(16))
    assert hits >= 12, f"only {hits}/16 cycle-1 P3 frames decoded"


def test_am_rc_chain_matches_complex(rng):
    """The real-valued AM chain (I/Q in, no complex dtypes) reproduces the
    complex chain's decode bit-exactly — the on-chip AM path now covers
    acquire+sync, not just the hard-symbol FEC tail."""
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_am as sca
    from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am

    n = 6
    p1 = rng.integers(0, 2, (n, 8, C.P1_FRAME_LEN_AM)).astype(np.uint8)
    p3 = rng.integers(0, 2, (n, C.P3_FRAME_LEN_MA1)).astype(np.uint8)
    mats = EAM.interleave_frames(
        [EAM.encode_p1_am(p1[f]) for f in range(n)],
        [EAM.encode_p3_am(p3[f], False) for f in range(n)], False)
    pids_bits = rng.integers(0, 2,
                             (n * 8, C.PIDS_FRAME_LEN)).astype(np.uint8)
    pids_codes = np.stack([EAM.encode_pids_am(p) for p in pids_bits])
    ref = np.stack([EAM.am_ref_bits(b % 8, 1) for b in range(n * 8)])
    sig = modulate_am(mats, pids_codes, ref, False)
    sig = ch.impair(sig, sample_rate=C.SAMPLE_RATE_CS16_AM, cfo_hz=8.0,
                    snr_db=35.0, rng=rng)

    buf = np.zeros(sca.am_buffer_len(n), np.complex64)
    start = C.FFTCP_AM // 2
    buf[start:start + len(sig)] = sig
    out_c, _ = sca.am_chain_scan(jnp.asarray(buf),
                                 sca.am_chain_init_carry(), n, False)

    buf_rc = jnp.asarray(np.stack([buf.real, buf.imag], -1)
                         .astype(np.float32))
    out_r, _ = scar.am_chain_scan_rc(buf_rc, scar.am_chain_rc_init_carry(),
                                     n, False)
    for f in range(3, n):
        assert np.array_equal(np.asarray(out_r["p1"][f]), p1[f]), f
        assert np.array_equal(np.asarray(out_r["p3"][f]), p3[f]), f
    assert np.array_equal(np.asarray(out_r["pids"]), pids_bits)
    assert np.array_equal(np.asarray(out_r["p1"][3:]),
                          np.asarray(out_c["p1"][3:]))


def test_fm_chain_batch_rc_matches_scan(rng):
    """The flat-batched rc batch function (P1 FEC over stations × frames,
    a TPU-layout optimization) must be bit-identical to the per-station
    fused scan — including PX channels and the carried state.  Stations
    carry DISTINCT signals and s != n_frames, so any station/frame axis
    transposition in the flat reshapes fails loudly."""
    import jax
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.tx.encoder import build_pm_matrix, build_px_stream
    from nrsc5_tpu.tx.modulator import modulate_fm

    psmi, n_cycles, s = 3, 1, 3
    fl = C.P3_FRAME_LEN_MP3_MP11
    n_blocks = n_cycles * 32  # 2 frames per dispatch
    bufs, carries0 = [], []
    for _ in range(s):
        p3 = rng.integers(0, 2, (n_cycles, 16, fl)).astype(np.uint8)
        mats = [build_pm_matrix(
            rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
            rng.integers(0, 2, (16, 80)).astype(np.uint8))
            for _ in range(n_cycles * 2)]
        px = build_px_stream(p3, fl).reshape(n_cycles * 32 * C.BLKSZ, -1)
        sig = modulate_fm(np.concatenate(mats),
                          np.tile(np.arange(16), n_cycles * 2), psmi,
                          px1_signs=px)
        buf = np.zeros((rcc.buffer_len(n_blocks), 2), np.float32)
        start = C.FFTCP_FM // 2
        buf[start:start + len(sig), 0] = sig.real
        buf[start:start + len(sig), 1] = -sig.imag
        bufs.append(buf)
        carries0.append(rcc.chain_rc_init_carry(psmi=psmi))

    carries = jax.tree.map(lambda *xs: jnp.stack(xs), *carries0)
    out_b, carry_b = rcc.fm_chain_batch_rc(
        jnp.asarray(np.stack(bufs)), carries, n_blocks, psmi, 0)
    for i in range(s):
        out_s, carry_s = rcc.fm_chain_scan_rc(
            jnp.asarray(bufs[i]), carries0[i], n_blocks, psmi, 0)
        for k in ("p1", "px1", "px2", "pids", "p1_margin"):
            if k not in out_s:
                continue
            assert np.array_equal(np.asarray(out_b[k][i]),
                                  np.asarray(out_s[k])), (k, i)
        for leaf_b, leaf_s in zip(jax.tree.leaves(carry_b),
                                  jax.tree.leaves(carry_s)):
            assert np.array_equal(np.asarray(leaf_b[i]),
                                  np.asarray(leaf_s))


def test_am_chain_batch_rc_matches_scan(rng):
    """The AM batch function (frontend per station under vmap, K=9 FEC
    flat-batched across stations × frames) must be bit-identical to the
    per-station fused scan.  Stations carry DISTINCT signals so an axis
    transposition in the flat reshapes fails loudly."""
    import jax
    import jax.numpy as jnp
    from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
    from nrsc5_tpu.tx import encoder_am as EAM
    from nrsc5_tpu.tx.modulator_am import modulate_am

    n, s = 5, 2
    bufs, carries0 = [], []
    for _ in range(s):
        p1 = rng.integers(0, 2, (n, 8, C.P1_FRAME_LEN_AM)).astype(np.uint8)
        p3 = rng.integers(0, 2, (n, C.P3_FRAME_LEN_MA1)).astype(np.uint8)
        mats = EAM.interleave_frames(
            [EAM.encode_p1_am(p1[f]) for f in range(n)],
            [EAM.encode_p3_am(p3[f], False) for f in range(n)], False)
        pids_codes = np.stack([EAM.encode_pids_am(
            rng.integers(0, 2, 80).astype(np.uint8)) for _ in range(n * 8)])
        ref = np.stack([EAM.am_ref_bits(b % 8, 1) for b in range(n * 8)])
        sig = modulate_am(mats, pids_codes, ref, False)
        buf = np.zeros((scar.am_buffer_len(n), 2), np.float32)
        start = C.FFTCP_AM // 2
        buf[start:start + len(sig), 0] = sig.real
        buf[start:start + len(sig), 1] = sig.imag
        bufs.append(buf)
        carries0.append(scar.am_chain_rc_init_carry())

    carries = jax.tree.map(lambda *xs: jnp.stack(xs), *carries0)
    out_b, carry_b = scar.am_chain_batch_rc(
        jnp.asarray(np.stack(bufs)), carries, n, False)
    for i in range(s):
        out_s, carry_s = scar.am_chain_scan_rc(jnp.asarray(bufs[i]),
                                               carries0[i], n, False)
        for k in ("p1", "p3", "pids", "p1_margin", "p3_margin"):
            assert np.array_equal(np.asarray(out_b[k][i]),
                                  np.asarray(out_s[k])), (k, i)
        for leaf_b, leaf_s in zip(jax.tree.leaves(carry_b),
                                  jax.tree.leaves(carry_s)):
            assert np.array_equal(np.asarray(leaf_b[i]),
                                  np.asarray(leaf_s))


def test_am_cold_start_rc(rng):
    """AM cold start on the rc chain: unknown timing + integer and
    fractional CFO -> cold_start_am_rc locks (frame-aligned by the
    bc-history rule) and the fused chain decodes every post-warm-up
    subframe bit-exactly from the locked carry."""
    import jax.numpy as jnp

    from .capture_helpers import build_am_capture
    from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.transport_encoder import build_p1_am_frame

    bin_hz = C.SAMPLE_RATE_CS16_AM / C.FFT_AM
    for ma3, cfo_hz, off in ((False, 2 * bin_hz + 31.0, 777),
                             (True, -1 * bin_hz + 17.0, 500)):
        sig, packets = build_am_capture(rng, n_frames=9, ma3=ma3)
        imp = ch.impair(sig, sample_offset=off, cfo_hz=cfo_hz,
                        snr_db=30.0, sample_rate=C.SAMPLE_RATE_CS16_AM,
                        rng=rng)
        rcs = np.stack([imp.real, imp.imag], -1).astype(np.float32)
        lock = scar.cold_start_am_rc(rcs)
        assert lock is not None and lock["ma3"] == ma3, (ma3, lock)
        assert lock["cfo"] == round(cfo_hz / bin_hz), lock["cfo"]

        n_frames = 5
        need = scar.am_buffer_len(n_frames)
        out, _ = scar.am_chain_scan_rc(
            jnp.asarray(rcs[lock["offset"]:lock["offset"] + need]),
            lock["carry"], n_frames, ma3)
        p1 = np.asarray(out["p1"])
        truth = []
        for i, (f, pk) in enumerate(packets):
            sub = i % 8
            truth.append(build_p1_am_frame(pk, 0, pdu_seq=sub,
                                           seq=((f * 8 + sub) * 4) % 64))
        matches = sum(
            1 for fi in range(n_frames) for sub in range(8)
            if any(np.array_equal(p1[fi, sub], t) for t in truth))
        # diversity warm-up blanks the first 3 frames (24 subframes);
        # everything after must be bit-exact
        assert matches == n_frames * 8 - 24, (ma3, matches)
