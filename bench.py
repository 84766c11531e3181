"""Headline benchmark: multi-station FM receive-chain throughput per chip.

Measures the fused steady-state chain (acquire derotate/fold/FFT → Costas
sync → equalize → soft demap → deinterleave → chunk-parallel Viterbi →
descramble, i.e. I/Q in → L2 PDU bits out) on a batch of stations, and
prints ONE JSON line.

Baseline: the reference C implementation is an implied 1x-real-time
single-station receiver (BASELINE.md); real time is 744187.5 complex
samples/s at the FM internal rate (1488375 cu8 samples/s).  ``value`` is
the per-chip real-time multiple: (stations x seconds of signal) / wall
second.  BASELINE.json's north-star target is >=100x.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, default=16)
    ap.add_argument("--frames", type=int, default=2, help="P1 frames per station per step")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import os
    import jax
    # NB: the persistent compilation cache is NOT enabled by default — the
    # axon TPU backend fails with UNIMPLEMENTED when executables are
    # (de)serialized.  Opt in with NRSC5_BENCH_CACHE=1 on backends that
    # support it.
    if os.environ.get("NRSC5_BENCH_CACHE"):
        cache = os.path.expanduser("~/.cache/jax")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.pipeline import scan_chain as sc
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm

    rng = np.random.default_rng(7)
    n_blocks = args.frames * C.P1_FM_BLOCKS

    # one real frame, tiled across frames/stations (content doesn't affect
    # the compute path; everything is static-shape)
    p1 = rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8)
    pids = rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8)
    mat = build_pm_matrix(p1, pids)
    matrix = np.concatenate([mat] * args.frames)
    bc_seq = np.tile(np.arange(16), args.frames)
    sig = modulate_fm(matrix, bc_seq, 1)

    buf = np.zeros(sc.buffer_len(n_blocks), np.complex64)
    start = C.FFTCP_FM // 2
    buf[start:start + len(sig)] = sig
    samples = jnp.asarray(np.broadcast_to(buf, (args.stations, len(buf))))

    def make_carries():
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (args.stations,) + x.shape),
            sc.chain_init_carry())

    step = jax.jit(lambda s, c: sc.fm_chain_batch(s, c, n_blocks, 1, 0))

    carries = make_carries()
    out, _ = step(samples, carries)  # compile + warm up
    jax.block_until_ready(out)
    # correctness gate: the benched path must actually decode.
    # (fetch the whole array — indexing on-device compiles a gather that
    # the axon backend rejects with UNIMPLEMENTED)
    assert np.array_equal(np.asarray(out["p1"])[0, 0], p1), "bench decode failed"

    t0 = time.perf_counter()
    for _ in range(args.reps):
        out, _ = step(samples, carries)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    n_samples = args.reps * args.stations * n_blocks * C.BLKSZ * C.FFTCP_FM
    sps = n_samples / dt
    realtime = sps / C.SAMPLE_RATE_CS16_FM

    if args.verbose:
        dev = jax.devices()[0]
        print(f"# device={dev.platform}:{dev.device_kind} stations={args.stations} "
              f"frames={args.frames} reps={args.reps} wall={dt:.3f}s "
              f"sps={sps:.3e}")
    print(json.dumps({
        "metric": "fm_full_chain_realtime_multiple_per_chip",
        "value": round(realtime, 2),
        "unit": "x_realtime",
        "vs_baseline": round(realtime, 2),
    }))


if __name__ == "__main__":
    main()
