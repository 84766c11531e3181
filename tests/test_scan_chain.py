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
