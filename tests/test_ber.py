"""Link-quality behavior: BER gates and SNR thresholds.

The reference has no BER benchmarks (SURVEY.md §6); these tests pin the
expected qualitative behavior of the chain: clean decode well above
threshold, graceful degradation below, and a truthful re-encode BER
estimate (reference self-check analog: src/decode.c:234-277)."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.pipeline import scan_chain as sc
from nrsc5_tpu.tx import channel as ch
from nrsc5_tpu.tx.encoder import build_pm_matrix
from nrsc5_tpu.tx.modulator import modulate_fm


def _run_at_snr(rng, snr_db):
    p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
    pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    matrix = build_pm_matrix(p1, pids)
    sig = modulate_fm(matrix, np.arange(16), 1)
    sig = ch.impair(sig, snr_db=snr_db, rng=rng)
    buf = np.zeros(sc.buffer_len(16), np.complex64)
    start = C.FFTCP_FM // 2
    buf[start:start + len(sig)] = sig
    out, _ = sc.fm_chain_scan(buf, sc.chain_init_carry(), 16, 1, 0)
    frame_ok = np.array_equal(np.asarray(out["p1"][0]), p1)
    cber = float(out["p1_bit_errors"][0]) / C.P1_FRAME_LEN_ENCODED_FM
    return frame_ok, cber


def test_ber_vs_snr(rng):
    # measured curve (CPU, seed 0x5EED): cber 0 @ >=10 dB, 1.9e-3 @ 2 dB,
    # 3.3e-2 @ -2 dB with the frame still bit-exact — soft-decision
    # rate-2/5 K=7 holds to around -4 dB
    ok_hi, cber_hi = _run_at_snr(rng, 20.0)
    assert ok_hi and cber_hi < 1e-4

    ok_mid, cber_mid = _run_at_snr(rng, 2.0)
    assert ok_mid, "rate-2/5 K=7 should still decode at 2 dB"
    assert 1e-4 < cber_mid < 0.02, \
        "BER estimate should reflect channel errors"

    ok_lo, cber_lo = _run_at_snr(rng, -8.0)
    assert cber_lo > 0.05, "deep-noise channel must show high BER"
    assert not ok_lo, "frame should fail well below threshold"
