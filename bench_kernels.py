"""Per-kernel microbenchmarks with roofline context.

Times the hot device kernels of the receive chain in isolation and prints
one line per kernel: ms/call, achieved samples/s-of-signal, and GFLOP/s
where a FLOP count is meaningful.  Run with --stations to scale the batch.

(The reference's equivalents: firdecim_q15 NEON FIR, FFTW 2048-pt, conv_dec
SSE Viterbi — see SURVEY.md §2 rows 5/6/9.)
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ab-agreement", action="store_true",
                    help="also measure radix-4 vs radix-1 Viterbi bit "
                         "agreement at 10 dB Es/N0 (round-1 VERDICT item: "
                         "quantify the radix tie-flip margin on-chip)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.ops import frontend as FE
    from nrsc5_tpu.ops.decode_fm import p1_decode
    from nrsc5_tpu.pipeline import scan_chain as sc
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc
    from nrsc5_tpu.utils.profiling import measure

    B = args.stations
    dev = jax.devices()[0]
    cpu = jax.default_backend() == "cpu"
    print(f"# device={dev.platform}:{dev.device_kind} stations={B} "
          f"chain={'complex' if cpu else 'rc'}", file=sys.stderr)

    def bcast(tree):
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                            tree)

    def sync_fetch(out):
        # fetch (real leaves only): the only reliable device sync on axon
        jax.tree.map(
            lambda x: np.asarray(x) if not jnp.iscomplexobj(x) else None,
            out)

    rows = []

    # 0. dispatch + fetch round-trip baseline (dominates small kernels on
    # remote backends: subtract this from per-call times mentally)
    tiny = jax.jit(lambda a: a * 2.0)
    one = jnp.ones(8)
    m = measure(tiny, one, reps=args.reps, sync=sync_fetch)
    rows.append(("dispatch_fetch_baseline", m, float("nan")))

    # 1. halfband decimator (1.488 MS/s -> 744 kS/s), 1 s of signal each
    if cpu:
        n_in = 1 << 21
        x = jnp.asarray(np.zeros((B, n_in), np.complex64))
        tails = bcast(FE.frontend_init_state(1))
        fir = jax.jit(jax.vmap(FE.fm_decimate))
        m = measure(fir, x, tails, reps=args.reps,
                    flops=B * n_in // 2 * 8 * 4 * 2)
        rows.append(("halfband_fir_div2", m,
                     B * n_in / m.per_call_s / C.SAMPLE_RATE_CU8))

    # 2. rc acquire+sync (one L1 block, derotate/fold/DFT/costas/demap)
    w = jnp.asarray(np.zeros((B, 71280, 2), np.float32))

    @jax.jit
    def front_block(ww):
        def one(x):
            c0 = rcc.chain_rc_init_carry()
            sp, ph, pa, se, kp = rcc.acquire_fine_rc(
                x, c0.phase, c0.prev_angle, c0.samperr_fb, c0.angle_fb)
            out, cph, cfr = rcc.sync_block_rc(
                sp, c0.costas_phase, c0.costas_freq, 1, 1080 - se)
            return out["pm"]
        return jax.vmap(one)(ww)

    m = measure(front_block, w, reps=args.reps, sync=sync_fetch)
    rows.append(("acquire_sync_block_rc", m,
                 B * 32 * C.FFTCP_FM / m.per_call_s / C.SAMPLE_RATE_CS16_FM))

    # 3. P1 Viterbi (deinterleave + chunk-parallel ACS + descramble)
    from nrsc5_tpu.ops.bits import pack_bits
    pm = jnp.zeros((B, 16 * 23040), jnp.int8)

    def _p1_packed(v):
        bits, margin, errors = p1_decode(v, chunked=True)
        # bit-pack the output: unpacked frames dominate the eager
        # program-output transfer on the tunneled backend (ops/bits.py)
        return pack_bits(bits), margin, errors

    p1f = jax.jit(jax.vmap(_p1_packed))
    acs_flops = 146240 * 64 * 2 * 10  # per frame: steps x states x ops
    m = measure(p1f, pm, reps=args.reps, flops=B * acs_flops,
                sync=sync_fetch)
    rows.append(("p1_viterbi_chunked", m,
                 B * 16 * 32 * C.FFTCP_FM / m.per_call_s
                 / C.SAMPLE_RATE_CS16_FM))

    # 3b. AM MA1 frame decode (bit-plane gather + K=9 chunked Viterbi);
    # input is hard QAM symbols (uint8) so this runs on any backend
    from nrsc5_tpu.ops.decode_am import am_decode_init_state, am_frame_decode
    sym = jnp.zeros((B, 8 * 32 * 25), jnp.uint8)
    am_states = bcast(am_decode_init_state())
    amf = jax.jit(jax.vmap(
        lambda a, b, c, d, st: pack_bits(
            am_frame_decode(a, b, c, d, st)[0].reshape(1, -1))))
    m = measure(amf, sym, sym, sym, sym, am_states, reps=args.reps,
                sync=sync_fetch)
    rows.append(("am_ma1_frame_decode", m,
                 B * 8 * 32 * C.FFTCP_AM / m.per_call_s
                 / C.SAMPLE_RATE_CS16_AM))

    # 4. full fused chain, one frame per station
    if cpu:
        buf = jnp.asarray(np.zeros((B, sc.buffer_len(16)), np.complex64))
        cys = bcast(sc.chain_init_carry())
        full = jax.jit(lambda s, c: sc.fm_chain_batch(s, c, 16, 1, 0)[0])
    else:
        buf = jnp.asarray(
            np.zeros((B, rcc.buffer_len(16), 2), np.float32))
        cys = bcast(rcc.chain_rc_init_carry())
        full = jax.jit(
            lambda s, c: rcc.fm_chain_batch_rc(s, c, 16, 1, 0,
                                               packed=True)[0])
    m = measure(full, buf, cys, reps=args.reps, sync=sync_fetch)
    rows.append(("full_chain_1frame", m,
                 B * 16 * 32 * C.FFTCP_FM / m.per_call_s
                 / C.SAMPLE_RATE_CS16_FM))

    # 5. HDC -> PCM audio decode (host-side: vectorized QMF + native
    # huffman; the reference analog is FAAD2 in src/output.c:126-163)
    import time as _time

    from nrsc5_tpu.audio.hdc_decoder import HDCDecoder
    from nrsc5_tpu.tx.hdc_encoder import HDCEncoder

    _rng = np.random.default_rng(0)
    _w = np.fft.rfft(_rng.normal(size=32 * 2048))
    _f = np.fft.rfftfreq(32 * 2048, 1 / 44100.0)
    _w *= np.where(_f > 8000, 0, 1 / np.sqrt(1 + (_f / 300) ** 2))
    _x = np.fft.irfft(_w, 32 * 2048)
    _x = 0.4 * _x / np.abs(_x).max()
    _st = np.stack([_x, 0.8 * _x], -1)
    _enc = HDCEncoder(2)
    _pkts = [_enc.encode_frame(_st[i * 2048:(i + 1) * 2048])
             for i in range(32)]
    _dec = HDCDecoder()
    for _p in _pkts[:4]:
        _dec.decode(_p)
    _t0 = _time.perf_counter()
    for _p in _pkts:
        _dec.decode(_p)
    _per = (_time.perf_counter() - _t0) / 32

    class _M:  # shape-compatible with measure()'s result row
        per_call_s, tflops = _per, None
    rows.append(("hdc_pcm_decode_pkt", _M, (2048 / 44100.0) / _per))

    print(f"{'kernel':24} {'ms/call':>9} {'GFLOP/s':>9} {'x_realtime':>11}")
    for name, m, rt in rows:
        gf = f"{m.tflops * 1e3:.1f}" if m.tflops else "-"
        print(f"{name:24} {m.per_call_s * 1e3:9.3f} {gf:>9} {rt:11.1f}")

    if args.ab_agreement:
        # radix-4 vs radix-1 bit agreement at operating SNR: the radix ACS
        # sums branch metrics in a different association order, so float
        # near-ties can resolve to a different (equally likely) ML path;
        # quantify how often at 10 dB Es/N0 (clean-capture operating point)
        from nrsc5_tpu.ops.convolutional import (conv_encode, depuncture,
                                                 puncture,
                                                 viterbi_decode_chunked)
        rng = np.random.default_rng(7)
        t = C.P1_FRAME_LEN_FM
        tx = rng.integers(0, 2, (B, t)).astype(np.uint8)
        coded = puncture(conv_encode(tx, 7, C.CONV_K7_GEN),
                         C.PUNCTURE_P1_PIDS_FM)
        llr10 = (coded.astype(np.float32) * 2 - 1
                 + rng.normal(0, 10 ** (-10 / 20), coded.shape)
                 .astype(np.float32))
        full = depuncture(llr10, C.PUNCTURE_P1_PIDS_FM, t * 3) \
            .reshape(B, t, 3)
        r4 = np.asarray(viterbi_decode_chunked(
            jnp.asarray(full), 7, C.CONV_K7_GEN, radix=4)[0])
        r1 = np.asarray(viterbi_decode_chunked(
            jnp.asarray(full), 7, C.CONV_K7_GEN, radix=1, fuse=8)[0])
        dis = int((r4 != r1).sum())
        err4 = int((r4 != tx).sum())
        err1 = int((r1 != tx).sum())
        print(f"ab_agreement_10dB: radix4 vs radix1 disagree {dis}/"
              f"{r4.size} bits ({dis / r4.size:.2e}); decode errors "
              f"radix4={err4} radix1={err1}")


if __name__ == "__main__":
    main()
