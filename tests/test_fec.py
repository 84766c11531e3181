"""Roundtrip tests for the FEC core: scrambler, conv codes, puncturing."""

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops.convolutional import (
    conv_encode,
    depuncture,
    puncture,
    viterbi_decode,
    viterbi_decode_chunked,
)
from nrsc5_tpu.ops.scramble import descramble, scramble, scrambler_keystream


def test_scrambler_keystream_lfsr():
    # independently step the LFSR from the spec and compare
    ks = scrambler_keystream(64)
    val = 0x3FF
    ref = []
    for _ in range(64):
        bit = ((val >> 9) ^ val) & 1
        val |= bit << 11
        val >>= 1
        ref.append(bit)
    assert ks.tolist() == ref


def test_scramble_roundtrip(rng):
    bits = rng.integers(0, 2, size=(3, C.PIDS_FRAME_LEN), dtype=np.uint8)
    assert np.array_equal(descramble(scramble(bits)), bits)
    assert not np.array_equal(scramble(bits), bits)


@pytest.mark.parametrize(
    "k,gens",
    [(7, C.CONV_K7_GEN), (9, C.CONV_E1_GEN), (9, C.CONV_E2_E3_GEN)],
)
def test_conv_encoder_matches_reference_recursion(rng, k, gens):
    # step the reference shift-register recursion directly
    # (reference: src/decode.c:240-256)
    t = 200
    bits = rng.integers(0, 2, size=t, dtype=np.uint8)
    r = 0
    for i in range(k - 1):
        r = (r >> 1) | (int(bits[t - (k - 1) + i]) << (k - 1))
    ref = []
    for i in range(t):
        r = (r >> 1) | (int(bits[i]) << (k - 1))
        for g in gens:
            ref.append(bin(r & g).count("1") & 1)
    enc = conv_encode(bits, k, gens)
    assert enc.tolist() == ref


@pytest.mark.parametrize(
    "k,gens,pattern,t",
    [
        (7, C.CONV_K7_GEN, C.PUNCTURE_P1_PIDS_FM, C.PIDS_FRAME_LEN),
        (7, C.CONV_K7_GEN, C.PUNCTURE_P1_PIDS_FM, 1000),
        (7, C.CONV_K7_GEN, C.PUNCTURE_P3_P4_FM, 960),
        (9, C.CONV_E1_GEN, C.PUNCTURE_E1, C.P1_FRAME_LEN_AM),
        (9, C.CONV_E2_E3_GEN, C.PUNCTURE_E2, 600),
    ],
)
def test_viterbi_roundtrip_clean(rng, k, gens, pattern, t):
    bits = rng.integers(0, 2, size=(2, t), dtype=np.uint8)
    coded = conv_encode(bits, k, gens)
    punct = puncture(coded, pattern)
    llr = punct.astype(np.float32) * 2 - 1  # hard symbols +-1
    full = depuncture(llr, pattern, t * 3).reshape(2, t, 3)
    dec, margin = viterbi_decode(full, k, gens)
    assert np.array_equal(np.asarray(dec), bits)
    assert np.all(np.asarray(margin) > 0)


def test_viterbi_noisy(rng):
    # soft symbols with AWGN well inside the code's correction range
    k, gens, pattern = 7, C.CONV_K7_GEN, C.PUNCTURE_P1_PIDS_FM
    t = 2000
    bits = rng.integers(0, 2, size=t, dtype=np.uint8)
    coded = conv_encode(bits, k, gens)
    punct = puncture(coded, pattern).astype(np.float32) * 2 - 1
    noisy = punct + rng.normal(0, 0.6, punct.shape).astype(np.float32)
    full = depuncture(noisy, pattern, t * 3).reshape(t, 3)
    dec, _ = viterbi_decode(full, k, gens)
    assert np.array_equal(np.asarray(dec), bits)


def test_viterbi_p1_full_frame(rng):
    # the real P1 FM shape: 146176 bits, rate 2/5
    t = C.P1_FRAME_LEN_FM
    bits = rng.integers(0, 2, size=t, dtype=np.uint8)
    coded = conv_encode(bits, 7, C.CONV_K7_GEN)
    punct = puncture(coded, C.PUNCTURE_P1_PIDS_FM)
    assert punct.shape[-1] == C.P1_FRAME_LEN_ENCODED_FM
    llr = punct.astype(np.float32) * 2 - 1
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, t * 3).reshape(t, 3)
    dec, _ = viterbi_decode(full, 7, C.CONV_K7_GEN)
    assert np.array_equal(np.asarray(dec), bits)


def test_viterbi_chunked_matches_sequential(rng):
    """The overlapping-chunk Viterbi must reproduce the sequential decision
    path on noisy inputs (free-boundary paths merge within the overlap)."""
    from nrsc5_tpu.ops.convolutional import (conv_encode, puncture, depuncture,
                                             viterbi_decode,
                                             viterbi_decode_chunked)
    from nrsc5_tpu import constants as C
    import numpy as np

    t = 9136  # P1_FRAME_LEN_FM / 16
    bits = rng.integers(0, 2, (3, t)).astype(np.uint8)
    coded = puncture(conv_encode(bits, 7, C.CONV_K7_GEN), C.PUNCTURE_P1_PIDS_FM)
    llr = coded.astype(np.float32) * 2 - 1
    llr = llr + rng.normal(0, 0.7, llr.shape).astype(np.float32)
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, t * 3).reshape(3, t, 3)

    seq_bits, _ = viterbi_decode(full, 7, C.CONV_K7_GEN)
    chk_bits, _ = viterbi_decode_chunked(full, 7, C.CONV_K7_GEN,
                                         chunk=1024, overlap=96)
    assert np.array_equal(np.asarray(seq_bits), np.asarray(chk_bits))
    # and both recover the transmitted bits at this SNR
    assert np.array_equal(np.asarray(seq_bits), bits)


@pytest.mark.parametrize("k,gens,radix", [
    (7, (0o133, 0o171, 0o165), 2),
    (7, (0o133, 0o171, 0o165), 4),
    (7, (0o133, 0o171, 0o165), 6),
    (9, (0o561, 0o657, 0o711), 4),
])
def test_viterbi_radix_matches(rng, k, gens, radix):
    """Radix-2^r ACS must reproduce the radix-1 Viterbi path."""
    from nrsc5_tpu.ops.convolutional import (_acs_traceback,
                                             _acs_traceback_radix)
    import jax.numpy as jnp

    t = 480
    llr = rng.normal(0, 1, (3, t, 3)).astype(np.float32)
    ext = jnp.asarray(llr)
    b1, m1 = _acs_traceback(ext, k, gens)
    br, mr = _acs_traceback_radix(ext, k, gens, radix)
    assert np.allclose(np.asarray(m1), np.asarray(mr), atol=1e-3)
    assert np.array_equal(np.asarray(b1), np.asarray(br))


def test_viterbi_chunked_radix_roundtrip(rng):
    from nrsc5_tpu.ops.convolutional import (conv_encode, depuncture,
                                             puncture, viterbi_decode_chunked)
    from nrsc5_tpu import constants as C

    t = 9136
    bits = rng.integers(0, 2, (2, t)).astype(np.uint8)
    coded = puncture(conv_encode(bits, 7, C.CONV_K7_GEN),
                     C.PUNCTURE_P1_PIDS_FM)
    llr = coded.astype(np.float32) * 2 - 1
    llr = llr + rng.normal(0, 0.5, llr.shape).astype(np.float32)
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, t * 3).reshape(2, t, 3)
    out, _ = viterbi_decode_chunked(full, 7, C.CONV_K7_GEN, radix=4)
    assert np.array_equal(np.asarray(out), bits)


def test_chunked_viterbi_explicit_static_args(rng):
    """Regression: every tuning knob of viterbi_decode_chunked must be a
    static jit argument — passing unroll explicitly once produced a traced
    `unroll` inside lax.scan (only reachable on the radix>1 accelerator
    path, so plain CPU tests missed it)."""
    bits = rng.integers(0, 2, 7000).astype(np.uint8)
    import jax.numpy as jnp
    llr = (conv_encode(bits, 7, C.CONV_K7_GEN).astype(np.float32) * 2
           - 1).reshape(-1, 3) * 20
    out, _ = viterbi_decode_chunked(jnp.asarray(llr), 7, C.CONV_K7_GEN,
                                    chunk=1024, overlap=96, radix=4,
                                    unroll=2)
    assert np.array_equal(np.asarray(out), bits)


@pytest.mark.parametrize("k,gens,fuse", [
    (7, (0o133, 0o171, 0o165), 8),
    (7, (0o133, 0o171, 0o165), 16),
    (9, (0o561, 0o657, 0o711), 8),
])
def test_viterbi_fused_bit_identical(rng, k, gens, fuse):
    """The fused radix-1 ACS (`fuse` butterflies per scan step) must be
    BIT-IDENTICAL to the unfused recursion — unlike the radix-2^r ACS it
    keeps the radix-1 op order, so even float near-ties resolve the same."""
    from nrsc5_tpu.ops.convolutional import _acs_traceback
    import jax.numpy as jnp

    t = 480
    llr = rng.normal(0, 1, (3, t, 3)).astype(np.float32)
    ext = jnp.asarray(llr)
    b1, m1 = _acs_traceback(ext, k, gens)
    bf, mf = _acs_traceback(ext, k, gens, fuse=fuse)
    assert np.array_equal(np.asarray(m1), np.asarray(mf))
    assert np.array_equal(np.asarray(b1), np.asarray(bf))


def test_viterbi_chunked_fused_matches_sequential(rng):
    """Chunked + fused (the TPU default path) reproduces the sequential
    Viterbi path and recovers the transmitted bits."""
    from nrsc5_tpu.ops.convolutional import (conv_encode, depuncture,
                                             puncture, viterbi_decode,
                                             viterbi_decode_chunked)

    t = 9136
    bits = rng.integers(0, 2, (2, t)).astype(np.uint8)
    coded = puncture(conv_encode(bits, 7, C.CONV_K7_GEN),
                     C.PUNCTURE_P1_PIDS_FM)
    llr = coded.astype(np.float32) * 2 - 1
    llr = llr + rng.normal(0, 0.5, llr.shape).astype(np.float32)
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, t * 3).reshape(2, t, 3)
    seq_bits, _ = viterbi_decode(full, 7, C.CONV_K7_GEN)
    fus_bits, _ = viterbi_decode_chunked(full, 7, C.CONV_K7_GEN,
                                         chunk=1024, overlap=96, fuse=8,
                                         radix=1)
    assert np.array_equal(np.asarray(seq_bits), np.asarray(fus_bits))
    assert np.array_equal(np.asarray(seq_bits), bits)


@pytest.mark.parametrize("k,gens,r,fuse", [
    (7, (0o133, 0o171, 0o165), 4, 4),
    (7, (0o133, 0o171, 0o165), 2, 8),
    (9, (0o561, 0o657, 0o711), 4, 2),
])
def test_viterbi_radix_fused_bit_identical(rng, k, gens, r, fuse):
    """Fusing radix super-steps (fuse per scan iteration) keeps per-substep
    arithmetic unchanged, so it must be BIT-IDENTICAL to the unfused radix
    recursion (same margins, same bits, even at float near-ties)."""
    from nrsc5_tpu.ops.convolutional import _acs_traceback_radix
    import jax.numpy as jnp

    t = 512
    llr = rng.normal(0, 1, (3, t, 3)).astype(np.float32)
    ext = jnp.asarray(llr)
    b1, m1 = _acs_traceback_radix(ext, k, gens, r)
    bf, mf = _acs_traceback_radix(ext, k, gens, r, fuse=fuse)
    assert np.array_equal(np.asarray(m1), np.asarray(mf))
    assert np.array_equal(np.asarray(b1), np.asarray(bf))


def test_viterbi_chunked_radix_fused_recovers(rng):
    """Chunked + radix-4 + fuse (candidate TPU default) recovers the
    transmitted bits through encode->puncture->noise->decode."""
    from nrsc5_tpu.ops.convolutional import (conv_encode, depuncture,
                                             puncture,
                                             viterbi_decode_chunked)

    t = 9136
    bits = rng.integers(0, 2, (2, t)).astype(np.uint8)
    coded = puncture(conv_encode(bits, 7, C.CONV_K7_GEN),
                     C.PUNCTURE_P1_PIDS_FM)
    llr = coded.astype(np.float32) * 2 - 1
    llr = llr + rng.normal(0, 0.5, llr.shape).astype(np.float32)
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, t * 3).reshape(2, t, 3)
    dec, _ = viterbi_decode_chunked(full, 7, C.CONV_K7_GEN,
                                    chunk=1024, overlap=96, radix=4,
                                    fuse=4)
    assert np.array_equal(np.asarray(dec), bits)


def test_viterbi_chunked_margin_survives_radix_padding(rng):
    """Regression: the radix/fuse paths used to zero-pad each segment to a
    multiple of radix*fuse — a zero-LLR final step ties every state's top-2
    final metrics EXACTLY, collapsing the min-over-segments margin to 0 on a
    perfectly clean carrier (which false-trips the serve watchdog's
    silent-carrier trigger on TPU, where radix=4 is the default).  The plan
    now grows the trailing overlap with real wrapped LLRs instead; clean
    signal must keep a positive margin on every radix/fuse config while
    silence still collapses it (the watchdog contract)."""
    from nrsc5_tpu.ops.convolutional import (conv_encode, depuncture,
                                             puncture, viterbi_decode,
                                             viterbi_decode_chunked)
    from nrsc5_tpu import constants as C

    t = C.P1_FRAME_LEN_FM  # 146176: the serve watchdog's actual frame
    bits = rng.integers(0, 2, t).astype(np.uint8)
    coded = puncture(conv_encode(bits, 7, C.CONV_K7_GEN),
                     C.PUNCTURE_P1_PIDS_FM)
    llr = coded.astype(np.float32) * 40 - 20
    full = depuncture(llr, C.PUNCTURE_P1_PIDS_FM, t * 3).reshape(t, 3)

    ref_bits, _ = viterbi_decode(full, 7, C.CONV_K7_GEN)
    for radix, fuse in ((1, 1), (4, 1), (1, 4), (4, 2)):
        out, margin = viterbi_decode_chunked(full, 7, C.CONV_K7_GEN,
                                             radix=radix, fuse=fuse)
        assert float(margin) > 1.0, (radix, fuse, float(margin))
        assert np.array_equal(np.asarray(out), np.asarray(ref_bits)), \
            (radix, fuse)

    _, dead = viterbi_decode_chunked(np.zeros_like(full), 7, C.CONV_K7_GEN,
                                     radix=4)
    assert float(dead) < 1e-3
