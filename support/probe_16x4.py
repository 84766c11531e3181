"""Isolate the 16x4 dispatch cliff (VERDICT r3 weak #5): time the fused
frontend scan ALONE (no FEC) at frames = 2/4/6/8 per dispatch, 16 stations.

The FEC flat batch was already diagnosed as an XLA layout window [58, 71]
and is padded through (docs/PERF.md); at frames=4 the per-dispatch scan
runs 64 blocks — the SAME window — so the hypothesis is that the scan's
stacked outputs (ys leading dim = n_blocks = 64) hit the same pathological
layout.  Run on the real chip:  python support/probe_16x4.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nrsc5_tpu.pipeline import scan_chain_rc as rcc

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}")
    S = 16
    rng = np.random.default_rng(0)

    rows = []
    for frames in (2, 3, 4, 5, 6, 8):
        n_blocks = frames * 16
        buflen = rcc.buffer_len(n_blocks)
        samples = jnp.asarray(
            rng.normal(0, 0.1, (S, buflen, 2)).astype(np.float32))
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape),
            rcc.chain_rc_init_carry())

        @jax.jit
        def scan_only(s, cy):
            pm, diag, _, ncy = jax.vmap(
                lambda a, b: rcc.frontend_scan_rc(a, b, n_blocks, 1)
            )(s, cy)
            return pm, ncy

        t0 = time.perf_counter()
        pm, ncy = scan_only(samples, carry)
        np.asarray(pm[0, 0, :4])  # sync (block_until_ready lies on axon)
        t_compile = time.perf_counter() - t0

        reps = 6
        t0 = time.perf_counter()
        for _ in range(reps):
            pm, carry = scan_only(samples, carry)
        np.asarray(pm[0, 0, :4])
        dt = (time.perf_counter() - t0) / reps
        per_block = dt / n_blocks * 1e3
        rows.append((frames, n_blocks, dt * 1e3, per_block))
        print(f"frames={frames} blocks={n_blocks}: {dt * 1e3:8.1f} ms/call "
              f"{per_block:6.2f} ms/block  (compile {t_compile:.0f}s)")

    print("\nsummary (scan only, 16 stations):")
    for frames, nb, ms, pb in rows:
        print(f"  {frames}f/{nb}b: {ms:8.1f} ms  {pb:5.2f} ms/block")


if __name__ == "__main__":
    main()
