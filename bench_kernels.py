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
    ap.add_argument("--roofline", action="store_true",
                    help="print the formal speed-of-light table for the "
                         "three named hot kernels (FIR, fold+DFT, Viterbi) "
                         "— achieved GB/s / TFLOP/s vs the v5e peak or the "
                         "scan-latency bound, with %% of governing bound "
                         "(BASELINE.md deliverable; regenerates the "
                         "docs/PERF.md round-5 roofline table)")
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

    if args.roofline:
        # ------------------------------------------------------------
        # Formal speed-of-light table (BASELINE.md deliverable): each
        # named hot kernel against ITS governing bound — HBM bandwidth
        # for the streaming FIR, the MXU bf16 peak for the DFT matmul,
        # and the sequential scan-step latency floor for the Viterbi
        # (its FLOPs are 5 orders below the chip ceiling; trip count
        # governs — docs/PERF.md round-5).  Public TPU v5e (v5 lite)
        # peaks: 197 TFLOP/s bf16, 819 GB/s HBM.
        # ------------------------------------------------------------
        PEAK_BF16 = 197e12
        PEAK_HBM = 819e9
        from nrsc5_tpu.ops import rcplx as rc
        from nrsc5_tpu.ops.convolutional import _chunk_plan

        base = rows[0][1].per_call_s  # dispatch+fetch round-trip
        sol = []

        # Each kernel runs R iterations inside ONE jit (fori_loop with
        # a scalar data dependence threaded through, so XLA can neither
        # hoist the loop-invariant kernel nor fold the chain), and the
        # output is one scalar via sum(abs(.)) — the tunnel's ~26 ms
        # dispatch round-trip and its multi-ms jitter would otherwise
        # swamp sub-ms kernels, and raw outputs would measure the eager
        # output ship, not the kernel (docs/PERF.md round-2).
        def loop_time(kernel, x0, R1, R2):
            """Per-iteration kernel time by SLOPE between two in-jit
            loop counts — immune to the tunnel's ~26 ms dispatch
            round-trip AND to device work hiding under it (a single
            call shorter than the RPC measures as zero here)."""
            def mk(R):
                return jax.jit(lambda x, _R=R: jax.lax.fori_loop(
                    0, _R, lambda i, s: kernel(x, s), jnp.float32(0)))
            t1 = measure(mk(R1), x0, reps=args.reps,
                         sync=sync_fetch).per_call_s
            t2 = measure(mk(R2), x0, reps=args.reps,
                         sync=sync_fetch).per_call_s
            return (t2 - t1) / (R2 - R1)

        # FIR: ÷2 halfband over 1.4 s of 1.488 MS/s signal per station —
        # 8 MACs/output on 16 B/sample of HBM traffic: bandwidth-bound
        # (production fuses it into the chain; the governing cost is
        # the streaming input read)
        # the per-iteration where() against the threaded scalar blocks
        # loop-invariant hoisting WITHOUT a linear identity XLA could
        # factor out (v+c and v*c both commute through the FIR/matmul);
        # it always selects v (s stays finite), at one elementwise pass
        rng_r = np.random.default_rng(3)

        def fresh(v, s):
            return jnp.where(v > s + 1e30, -v, v)

        n_in = 1 << 21
        ov = FE.rc_overlap(1)
        x = jnp.asarray(rng_r.normal(
            size=(B, n_in + ov, 2)).astype(np.float32))
        t = loop_time(
            lambda v, s: jnp.abs(
                FE.decimate_overlap_rc(fresh(v, s), 1)).sum(), x, 4, 16)
        byts = B * (n_in + ov) * 2 * 4
        gbps = byts / t / 1e9
        sol.append(("halfband_fir_div2", t * 1e3,
                    f"{gbps:.0f} GB/s", "819 GB/s (HBM)",
                    100 * gbps / (PEAK_HBM / 1e9), "HBM bandwidth"))

        # fold+DFT: the OFDM demod's [B*32, 2048] @ [2048, 2048] rc
        # matmul pair (bf16 inputs, f32 accumulation — ops/rcplx.dft)
        M_ = B * 32
        xs = jnp.asarray(rng_r.normal(
            size=(M_, 2048, 2)).astype(np.float32))
        t = loop_time(
            lambda v, s: jnp.abs(rc.dft(fresh(v, s), shift=True)).sum(),
            xs, 64, 256)
        flops = 4 * 2 * M_ * 2048 * 2048
        tf = flops / t / 1e12
        sol.append(("ofdm_fold_dft_2048", t * 1e3,
                    f"{tf:.2f} TFLOP/s", "197 TFLOP/s (bf16 MXU)",
                    100 * tf / (PEAK_BF16 / 1e12), "MXU peak"))

        # Viterbi ACS+traceback: governed by sequential scan-step
        # latency, not FLOPs.  Bound = measured floor of a minimal
        # same-trip-count scan (tiny carry, no real work) vs the real
        # kernel's time at the production chunk/radix/fuse plan.
        radix = 1 if cpu else int(os.environ.get("NRSC5_VITERBI_RADIX",
                                                 "4"))
        fuse = 1 if cpu else int(os.environ.get("NRSC5_VITERBI_FUSE",
                                                "8"))
        chunk = int(os.environ.get("NRSC5_VITERBI_CHUNK", "1152"))
        seg_idx, _, _ = _chunk_plan(C.P1_FRAME_LEN_FM, chunk, 96,
                                    multiple=radix * fuse)
        n_seg, seg_len = seg_idx.shape
        trips = seg_len // (radix * fuse)

        # floor: a scan with the PRODUCTION working set — the [B_eff,
        # 64] float32 path-metric carry and the per-trip [fuse, B_eff,
        # 64] int8 decisions stack (forward), plus the traceback's
        # [B_eff] carry over the same trips — but trivial per-element
        # work.  What the measured kernel pays above this floor is its
        # arithmetic; the floor itself is the scan-latency bound the
        # trip count implies.
        b_eff = B * n_seg

        def minimal_scan(c0):
            def fwd(c, _):
                c = c * 1.0000001 + 1.0
                return c, jnp.tile(c.astype(jnp.int8)[None], (fuse, 1, 1))
            c, dec = jax.lax.scan(fwd, c0, None, length=trips, unroll=2)

            def bwd(s, d):
                return s + d[0, :, 0].astype(jnp.int32), None
            s, _ = jax.lax.scan(bwd, jnp.zeros(b_eff, jnp.int32),
                                dec[::-1], unroll=2)
            return c.sum() + s.sum()
        floor = loop_time(
            lambda c, s: minimal_scan(c + s * 1e-30),
            jnp.zeros((b_eff, 64), jnp.float32), 8, 32)

        def vit(v, s):
            bits, margin, _ = p1_decode(
                v + jnp.where(s < -1.0, 1, 0).astype(jnp.int8),
                chunked=True)
            return bits.astype(jnp.float32).sum() + margin.sum()
        t = loop_time(lambda v, s: jax.vmap(
            lambda row: vit(row, s))(v).sum(), pm, 2, 6)
        sol.append((f"p1_viterbi r{radix}f{fuse}c{chunk}", t * 1e3,
                    f"{2 * trips} scan trips",
                    f"{floor * 1e3:.2f} ms ({2 * trips}-trip floor)",
                    100 * floor / t, "scan-step latency"))

        print(f"\n# roofline (slope-timed in-jit loops — immune to the "
              f"{base * 1e3:.0f} ms dispatch RTT; stations={B})")
        print(f"{'kernel':26} {'ms':>8} {'achieved':>16} "
              f"{'governing bound':>26} {'% of bound':>10}")
        for name, ms, ach, bound, pct, gov in sol:
            print(f"{name:26} {ms:8.3f} {ach:>16} {bound:>26} "
                  f"{pct:9.1f}%  ({gov})")

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
