"""Structural and roundtrip tests for the interleaver gather tables."""

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import interleavers as IL


def test_pm_matrix_tiling():
    # P1 + 16 x PIDS tile the 368640-cell PM matrix exactly (asserted inside)
    inv = IL.pm_inverse_table()
    assert inv.shape == (IL.PM_MATRIX_SIZE,)


def test_p1_pids_roundtrip(rng):
    # scatter a known stream into the matrix (TX), gather it back (RX)
    p1 = rng.integers(-127, 128, C.P1_FRAME_LEN_ENCODED_FM).astype(np.int8)
    pids = rng.integers(-127, 128, (16, C.PIDS_FRAME_LEN_ENCODED_FM)).astype(np.int8)
    stream = np.concatenate([p1, pids.reshape(-1)])
    matrix = stream[IL.pm_inverse_table()]
    assert np.array_equal(matrix[IL.p1_fm_table()], p1)
    for bc in range(16):
        block = matrix[bc * C.BLKSZ * IL.PM_ROW:(bc + 1) * C.BLKSZ * IL.PM_ROW]
        assert np.array_equal(block[IL.pids_fm_table()], pids[bc])


def test_p3_iv_permutation_and_hazard():
    for frame_len in (C.P3_FRAME_LEN_MP3_MP11, C.P3_FRAME_LEN_MP2):
        idx, n, calls = IL.p3_iv_tables(frame_len)
        assert len(np.unique(idx)) == n
        hazard = IL.p3_iv_hazard(frame_len)
        # record whether intra-call RAW hazards exist (drives the apply path)
        print(f"frame_len={frame_len}: hazard positions={hazard.sum()} of {n}")
        inv = IL.p3_iv_inverse(frame_len)
        assert np.array_equal(idx[inv], np.arange(n))


def test_p3_iv_reference_semantics(rng):
    """Emulate the reference's stateful read/write loop position by position
    and check the table-based formulation reproduces it exactly."""
    frame_len = C.P3_FRAME_LEN_MP2
    idx, n, calls = IL.p3_iv_tables(frame_len)
    call_len = n // calls
    internal = rng.integers(-127, 128, n).astype(np.int8)  # prior cycle
    incoming = rng.integers(-127, 128, n).astype(np.int8)  # this cycle
    # scalar emulation of src/decode.c:361-375 (read before write per i)
    buf = internal.copy()
    out_ref = np.empty(n, dtype=np.int8)
    for i in range(n):
        out_ref[i] = buf[idx[i]]
        buf[idx[i] if False else i] = incoming[i]  # write at linear position i
    # table-based: gather with intra-call hazard resolution
    hazard = IL.p3_iv_hazard(frame_len)
    out_tab = np.empty(n, dtype=np.int8)
    state = internal.copy()
    for c in range(calls):
        lo = c * call_len
        sl = slice(lo, lo + call_len)
        x = incoming[sl]
        r = idx[sl]
        vals = state[r]
        hz = hazard[sl]
        vals[hz] = x[r[hz] - lo]
        out_tab[sl] = vals
        state[sl] = x
    assert np.array_equal(out_tab, out_ref)


def test_am_tables_shapes():
    t = IL.am_ma1_tables(False)
    assert set(t) == {"bl", "ml", "bu", "mu", "el", "eu"}
    for name, (mat, sym, plane) in t.items():
        assert sym.max() < 8 * C.BLKSZ * C.PARTITION_WIDTH_AM
        assert np.all(sym >= 0)
    t3 = IL.am_ma1_tables(True)
    assert set(t3) == {"bl", "ml", "bu", "mu", "ebl", "eml", "ebu", "emu"}


def test_am_pids_tables():
    il_row, il_p, iu_row, iu_p, dl, du = IL.am_pids_tables()
    assert il_row.shape == (120,) and iu_row.shape == (120,)
    # delay tables form a permutation of 0..23
    assert sorted(np.concatenate([dl, du]).tolist()) == list(range(24))


def test_p1_structured_matches_table():
    """The structured (q, r, p') factorization reproduces p1_fm_table, and
    the one-hot matmul deinterleave is bit-exact vs the gather."""
    qsel, bpsel = IL.p1_fm_structured()
    # rebuild the flat table from the factors
    n = C.P1_FRAME_LEN_ENCODED_FM
    i = np.arange(n, dtype=np.int64)
    q, rp = i // 320, i % 320
    row_col = qsel[q].astype(np.int64)
    blk_part = bpsel[rp].astype(np.int64)
    idx = ((blk_part // 20) * 32 + row_col // 36) * 720 \
        + (blk_part % 20) * 36 + row_col % 36
    assert np.array_equal(idx, IL.p1_fm_table().astype(np.int64))

    # selections must be injective for the one-hot matmuls to be exact
    assert len(set(qsel.tolist())) == len(qsel)
    assert sorted(bpsel.tolist()) == list(range(320))

    from nrsc5_tpu.ops.decode_fm import _p1_deinterleave_mxu
    rng = np.random.default_rng(7)
    pm = rng.integers(-32, 32, 16 * 23040).astype(np.int8)
    got = np.asarray(jax.jit(_p1_deinterleave_mxu)(jnp.asarray(pm)))
    want = pm[IL.p1_fm_table()].astype(np.float32)
    assert np.array_equal(got, want)
