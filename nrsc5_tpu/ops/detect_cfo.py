"""Integer-CFO + block-offset search, fully batched.

The reference scans 76 candidate CFOs sequentially, running Costas loops and
needle matching per candidate (src/sync.c:292-337).  Here all
(cfo, reference-subcarrier) pairs run in one vectorized Costas scan and the
cyclic needle match is a batched compare — the host just argmaxes the
returned count matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops.sync_fm import costas_track

CFO_RANGE = 2 * C.PARTITION_WIDTH_FM  # +-38 bins
N_REFS = C.PM_PARTITIONS + 1  # 11 refs per sideband


@functools.lru_cache(maxsize=1)
def _needle_tables():
    """(vals uint8 [22, 32], known bool [22, 32]) for refs i=0..10 on both
    sidebands (rsid = (30-i) & 3)."""
    base = np.array(C.REF_SIGNS_FIXED, dtype=np.int64)
    vals = np.zeros((2 * N_REFS, C.BLKSZ), np.uint8)
    known = np.zeros((2 * N_REFS, C.BLKSZ), bool)
    for i in range(N_REFS):
        s = base.copy()
        rsid = (C.MIDDLE_REF_SC - i) & 0x3
        s[10] = rsid >> 1
        s[11] = (rsid >> 1) ^ (rsid & 1)
        k = s >= 0
        for row in (i, N_REFS + i):
            vals[row] = np.where(k, s, 0).astype(np.uint8)
            known[row] = k
    return vals, known


@jax.jit
def detect_cfo_scan(spectra):
    """spectra: [32, 2048] complex64.  Returns count int32 [76, 32]:
    count[c, o] = number of reference subcarriers whose sign sequence matches
    the control needle at block offset o under CFO (c - 38) bins."""
    cfos = jnp.arange(-CFO_RANGE, CFO_RANGE, dtype=jnp.int32)  # [76]
    i = jnp.arange(N_REFS, dtype=jnp.int32)
    bins_l = C.LB_START + cfos[:, None] + C.PARTITION_WIDTH_FM * i[None, :]
    bins_u = C.UB_END + cfos[:, None] - C.PARTITION_WIDTH_FM * i[None, :]
    bins = jnp.concatenate([bins_l, bins_u], axis=1)  # [76, 22]
    refs = spectra[:, bins]  # [32, 76, 22]
    nc = bins.shape[0] * bins.shape[1]
    flat = refs.reshape(C.BLKSZ, nc)

    cfo_freq = (2 * jnp.pi * cfos.astype(jnp.float32) * C.CP_FM / C.FFT_FM)
    cfo_flat = jnp.repeat(cfo_freq, 2 * N_REFS)

    zeros = jnp.zeros(nc, jnp.float32)
    derot, _, _, _ = costas_track(flat, zeros, zeros, cfo_flat)
    signs = (jnp.real(derot) > 0).astype(jnp.uint8)  # [32, nc]

    vals, known = _needle_tables()
    vals_j = jnp.asarray(vals)  # [22, 32]
    known_j = jnp.asarray(known)

    # cyclic shifts: shifted[o, n, c] = signs[(n + o) % 32, c]
    n_idx = (jnp.arange(C.BLKSZ)[None, :] + jnp.arange(C.BLKSZ)[:, None]) % C.BLKSZ
    shifted = signs[n_idx]  # [32 offsets, 32 syms, nc]
    sh = shifted.reshape(C.BLKSZ, C.BLKSZ, len(cfos), 2 * N_REFS)

    eq = sh == vals_j.T[None, :, None, :]
    neq = sh == (1 - vals_j.T[None, :, None, :])
    k = known_j.T[None, :, None, :]
    match = jnp.where(k, eq, True).all(axis=1) | jnp.where(k, neq, True).all(axis=1)
    # match: [offset, cfo, ref]
    count = match.sum(axis=-1).astype(jnp.int32)  # [offset, cfo]
    return count.T  # [cfo, offset]
