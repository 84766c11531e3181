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
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.ops import frontend as FE
    from nrsc5_tpu.ops.acquire import (WINDOW_FM, acquire_fm_fine,
                                       acquire_init_state)
    from nrsc5_tpu.ops.decode_fm import p1_decode
    from nrsc5_tpu.ops.sync_fm import sync_fm_block, sync_init_state
    from nrsc5_tpu.pipeline import scan_chain as sc
    from nrsc5_tpu.utils.profiling import measure

    B = args.stations
    dev = jax.devices()[0]
    print(f"# device={dev.platform}:{dev.device_kind} stations={B}",
          file=sys.stderr)

    def bcast(tree):
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                            tree)

    rows = []

    # 1. halfband decimator (1.488 MS/s -> 744 kS/s), 1 s of signal each
    n_in = 1 << 21
    x = jnp.zeros((B, n_in), jnp.complex64)
    tails = bcast(FE.frontend_init_state(1))
    fir = jax.jit(jax.vmap(FE.fm_decimate))
    m = measure(fir, x, tails, reps=args.reps,
                flops=B * n_in // 2 * 8 * 4 * 2)
    rows.append(("halfband_fir_div2", m,
                 B * n_in / m.per_call_s / C.SAMPLE_RATE_CU8))

    # 2. acquire fine (derotate + fold + 32x2048 FFT), one L1 block
    w = jnp.zeros((B, WINDOW_FM), jnp.complex64)
    acq = bcast(acquire_init_state())
    z = jnp.zeros(B, jnp.int32)
    zf = jnp.zeros(B, jnp.float32)
    acqf = jax.jit(jax.vmap(acquire_fm_fine))
    m = measure(acqf, w, acq, z, zf, z, reps=args.reps,
                flops=B * 32 * 5 * 2048 * 11 * 2)
    rows.append(("acquire_fold_fft", m,
                 B * 32 * C.FFTCP_FM / m.per_call_s / C.SAMPLE_RATE_CS16_FM))

    # 3. sync block (Costas scan + equalize + demap)
    sp = jnp.zeros((B, 32, 2048), jnp.complex64)
    ss = bcast(sync_init_state())
    syncf = jax.jit(jax.vmap(lambda a, b, d: sync_fm_block(a, b, 1, d)))
    m = measure(syncf, sp, ss, z, reps=args.reps)
    rows.append(("sync_costas_eq_demap", m,
                 B * 32 * C.FFTCP_FM / m.per_call_s / C.SAMPLE_RATE_CS16_FM))

    # 4. P1 Viterbi (deinterleave + chunk-parallel ACS + descramble)
    pm = jnp.zeros((B, 16 * 23040), jnp.int8)
    p1f = jax.jit(jax.vmap(lambda v: p1_decode(v, chunked=True)))
    acs_flops = 146240 * 64 * 2 * 10  # per frame: steps x states x ops
    m = measure(p1f, pm, reps=args.reps, flops=B * acs_flops)
    rows.append(("p1_viterbi_chunked", m,
                 B * 16 * 32 * C.FFTCP_FM / m.per_call_s
                 / C.SAMPLE_RATE_CS16_FM))

    # 5. full fused chain, one frame per station
    buf = jnp.zeros((B, sc.buffer_len(16)), jnp.complex64)
    cys = bcast(sc.chain_init_carry())
    full = jax.jit(lambda s, c: sc.fm_chain_batch(s, c, 16, 1, 0))
    m = measure(full, buf, cys, reps=args.reps)
    rows.append(("full_chain_1frame", m,
                 B * 16 * 32 * C.FFTCP_FM / m.per_call_s
                 / C.SAMPLE_RATE_CS16_FM))

    print(f"{'kernel':24} {'ms/call':>9} {'GFLOP/s':>9} {'x_realtime':>11}")
    for name, m, rt in rows:
        gf = f"{m.tflops * 1e3:.1f}" if m.tflops else "-"
        print(f"{name:24} {m.per_call_s * 1e3:9.3f} {gf:>9} {rt:11.1f}")


if __name__ == "__main__":
    main()
