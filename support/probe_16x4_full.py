"""Part 2 of the 16x4 cliff hunt: time the FULL fused dispatch
(fm_chain_batch_rc, packed) at frames = 2/4/6/8 x 16 stations, and
ablate PIDS / P1 / PX by component where the cliff shows.
Run:  PYTHONPATH=/root/repo python support/probe_16x4_full.py
"""
import time

import numpy as np


def sync(x):
    import jax
    return np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[:1]


def main():
    import jax
    import jax.numpy as jnp

    from nrsc5_tpu.pipeline import scan_chain_rc as rcc

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}")
    S = 16
    rng = np.random.default_rng(0)
    psmi = 1

    for frames in (2, 4, 6, 8):
        n_blocks = frames * 16
        buflen = rcc.buffer_len(n_blocks)
        samples = jnp.asarray(
            rng.normal(0, 0.1, (S, buflen, 2)).astype(np.float32))
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape),
            rcc.chain_rc_init_carry())

        fn = jax.jit(lambda s, c: rcc.fm_chain_batch_rc(
            s, c, n_blocks, psmi, 0, packed=True))
        t0 = time.perf_counter()
        out, ncy = fn(samples, carry)
        sync(out["p1"])
        t_compile = time.perf_counter() - t0

        reps = 6
        t0 = time.perf_counter()
        for _ in range(reps):
            out, carry = fn(samples, carry)
        sync(out["p1"])
        dt = (time.perf_counter() - t0) / reps
        print(f"frames={frames}: {dt * 1e3:8.1f} ms/call "
              f"{dt * 1e3 / frames:6.1f} ms/frame (compile {t_compile:.0f}s)")


if __name__ == "__main__":
    main()
