"""Real-valued complex arithmetic: I/Q as a trailing [..., 2] dimension.

Some TPU backends (the axon plugin here) implement no complex64 ops at
all, and even where complex is supported XLA lowers it to real pairs —
so the receive chain's hot path has a first-class real formulation.  The
representation is float32 [..., 2] with [..., 0] = Re and [..., 1] = Im.

The DFT is a dense matmul against precomputed cos/sin matrices — exactly
the shape the MXU wants (a 2048-point DFT over a 32-symbol block is a
[32, 2048] @ [2048, 2048] pair of matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def to_rc(x: np.ndarray | jax.Array) -> jax.Array:
    """complex array -> real-pair representation (host-side helper)."""
    x = np.asarray(x)
    return jnp.asarray(
        np.stack([x.real, x.imag], axis=-1).astype(np.float32))


def from_rc(x) -> np.ndarray:
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


def mul(a, b):
    """(a0+ia1)(b0+ib1)"""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def mul_conj(a, b):
    """a * conj(b)"""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br + ai * bi, ai * br - ar * bi], axis=-1)


def conj(a):
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def neg_conj(a):
    return jnp.stack([-a[..., 0], a[..., 1]], axis=-1)


def exp_i(theta):
    """e^{i theta} for real theta -> [..., 2]."""
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def abs2(a):
    return a[..., 0] ** 2 + a[..., 1] ** 2


def rabs(a):
    return jnp.sqrt(abs2(a))


def angle(a):
    return jnp.arctan2(a[..., 1], a[..., 0])


def div(a, b, eps: float = 0.0):
    """a / b elementwise."""
    d = abs2(b) + eps
    return mul_conj(a, b) / d[..., None]


def scale(a, s):
    """real scalar/array multiply."""
    return a * s[..., None]


def normalize(a, eps: float = 1e-20):
    return a / jnp.sqrt(abs2(a) + eps)[..., None]


@functools.lru_cache(maxsize=4)
def dft_tables(n: int):
    """Forward-DFT cos/sin matrices: X[k] = sum_n x[n] e^{-2pi i nk/N}.

    Returns (C, S) float32 [n, n] with C[j,k]=cos(2pi jk/n),
    S[j,k]=sin(2pi jk/n):  Re X = xr@C + xi@S;  Im X = xi@C - xr@S.
    """
    j = np.arange(n, dtype=np.float64)
    ang = 2 * np.pi * (j[:, None] * j[None, :] % n) / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


# matmul input dtype for the DFT: bfloat16 runs ~an order of magnitude
# faster on the MXU with f32 accumulation; the chain's QPSK soft demod is
# tolerant of the reduced mantissa (equality-at-operating-SNR is pinned by
# tests).  Set to jnp.float32 for exact parity with the complex chain.
DFT_DTYPE = jnp.bfloat16


def dft(x, shift: bool = False):
    """Batched forward DFT of rc arrays: x [..., N, 2] -> [..., N, 2].

    ``shift=True`` applies fftshift on the output axis.  Lowers to two
    [batch, N] @ [N, N] matmuls per component — MXU-shaped, cast to
    ``DFT_DTYPE`` with float32 accumulation.
    """
    n = x.shape[-2]
    c_np, s_np = dft_tables(n)
    c = jnp.asarray(c_np, DFT_DTYPE)
    s = jnp.asarray(s_np, DFT_DTYPE)
    xr = x[..., 0].astype(DFT_DTYPE)
    xi = x[..., 1].astype(DFT_DTYPE)
    mm = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
    re = mm(xr, c) + mm(xi, s)
    im = mm(xi, c) - mm(xr, s)
    out = jnp.stack([re, im], axis=-1)
    if shift:
        out = jnp.roll(out, n // 2, axis=-2)
    return out
