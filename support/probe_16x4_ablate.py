"""Part 3 of the 16x4 cliff hunt: ablate the fused dispatch by prefix at
frames=2/4/8 x 16 stations: scan | scan+pids | scan+p1fec | full(packed).
Run:  PYTHONPATH=/root/repo python support/probe_16x4_ablate.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nrsc5_tpu import constants as C
    from nrsc5_tpu.ops.decode_fm import p1_decode, pids_decode
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}")
    S = 16
    rng = np.random.default_rng(0)

    def variants(n_blocks):
        def scan_only(s, c):
            pm, diag, _, ncy = jax.vmap(
                lambda a, b: rcc.frontend_scan_rc(a, b, n_blocks, 1))(s, c)
            return pm.sum(), ncy

        def scan_pids(s, c):
            pm, diag, _, ncy = jax.vmap(
                lambda a, b: rcc.frontend_scan_rc(a, b, n_blocks, 1))(s, c)
            pids = jax.vmap(jax.vmap(pids_decode))(pm)
            return pids[0].sum() + pm.sum(), ncy

        def scan_p1(s, c):
            pm, diag, _, ncy = jax.vmap(
                lambda a, b: rcc.frontend_scan_rc(a, b, n_blocks, 1))(s, c)
            nf = n_blocks // C.P1_FM_BLOCKS
            flat = pm.reshape(S * nf, -1)
            B = flat.shape[0]
            pad = 72 - B if 56 < B < 72 else 0
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)])
            p1, margin, errors = jax.vmap(
                lambda m: p1_decode(m, chunked=True))(flat)
            return p1.sum() + pm.sum(), ncy

        def scan_p1_nopad(s, c):
            pm, diag, _, ncy = jax.vmap(
                lambda a, b: rcc.frontend_scan_rc(a, b, n_blocks, 1))(s, c)
            nf = n_blocks // C.P1_FM_BLOCKS
            flat = pm.reshape(S * nf, -1)
            p1, margin, errors = jax.vmap(
                lambda m: p1_decode(m, chunked=True))(flat)
            return p1.sum() + pm.sum(), ncy

        return [("scan", scan_only), ("scan+pids", scan_pids),
                ("scan+p1pad", scan_p1), ("scan+p1raw", scan_p1_nopad)]

    for frames in (2, 4, 8):
        n_blocks = frames * 16
        buflen = rcc.buffer_len(n_blocks)
        samples = jnp.asarray(
            rng.normal(0, 0.1, (S, buflen, 2)).astype(np.float32))
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape),
            rcc.chain_rc_init_carry())
        for name, fn in variants(n_blocks):
            jfn = jax.jit(fn)
            acc, ncy = jfn(samples, carry)
            np.asarray(acc)
            reps = 6
            t0 = time.perf_counter()
            cy = carry
            for _ in range(reps):
                acc, cy = jfn(samples, cy)
            np.asarray(acc)
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"frames={frames} {name:11s} {dt:8.1f} ms/call "
                  f"{dt / frames:6.1f} ms/frame")


if __name__ == "__main__":
    main()
