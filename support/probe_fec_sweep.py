"""Part 4: sweep the flat-batch size of the FULL p1_decode (bits + margin +
re-encode errors, chunked radix-4) to remap the XLA layout window after the
chunk-plan change (segment length 1215 -> 1216).
Run:  PYTHONPATH=/root/repo python support/probe_fec_sweep.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nrsc5_tpu.ops.decode_fm import p1_decode

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}")
    rng = np.random.default_rng(0)

    for B in (32, 48, 56, 64, 72, 80, 96, 112, 120, 128):
        pm = jnp.asarray(rng.integers(-64, 64, (B, 16 * 32 * 720))
                         .astype(np.int8))
        fn = jax.jit(lambda m: jax.vmap(
            lambda x: p1_decode(x, chunked=True))(m))
        out = fn(pm)
        np.asarray(out[1])
        reps = 6
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(pm)
        np.asarray(out[1])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"B={B:4d}: {dt:8.1f} ms/call {dt / B:6.2f} ms/frame")


if __name__ == "__main__":
    main()
