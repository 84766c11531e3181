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
