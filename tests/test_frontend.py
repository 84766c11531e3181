"""Front-end decimator tests: cu8 ingest -> halfband -> full decode."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops import frontend as FE
from nrsc5_tpu.tx import channel as ch


def test_halfband_dc_gain():
    import jax.numpy as jnp
    x = jnp.ones(1024, jnp.complex64)
    st = FE.frontend_init_state(1)
    y, _ = FE.fm_decimate(x, st)
    assert y.shape == (512,)
    # steady-state DC gain ~= 1 (ignore the filter warm-up head)
    assert np.allclose(np.asarray(y[32:]), 1.0, atol=2e-3)


def test_halfband_streaming_matches_batch():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    x = (rng.normal(0, 1, (4096, 2)).astype(np.float32)
         .view(np.complex64)[:, 0])
    st = FE.frontend_init_state(1)
    full, _ = FE.fm_decimate(jnp.asarray(x), st)
    st = FE.frontend_init_state(1)
    parts = []
    for i in range(0, 4096, 512):
        y, st = FE.fm_decimate(jnp.asarray(x[i:i + 512]), st)
        parts.append(np.asarray(y))
    assert np.allclose(np.concatenate(parts), np.asarray(full), atol=1e-6)


def test_cu8_end_to_end_decode(rng):
    """1.488 MS/s cu8 capture -> push_cu8 -> P1 bit exact."""
    from nrsc5_tpu.pipeline.receiver import FMReceiver
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm

    p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
    pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))
    matrix = np.concatenate([dummy[14 * 32:], build_pm_matrix(p1, pids),
                             dummy[:2 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16), np.arange(16), np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, 1, amplitude=0.15)
    cu8 = ch.to_cu8(ch.upsample2(sig))

    decoded = []
    rx = FMReceiver(lambda chan, bits, margin:
                    decoded.append(bits) if chan == 0 else None)
    for i in range(0, len(cu8), 32768):
        rx.push_cu8(cu8[i:i + 32768])
    assert decoded and np.array_equal(decoded[-1], p1)
