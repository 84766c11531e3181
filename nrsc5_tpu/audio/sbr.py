"""SBR (spectral band replication) for the HDC codec.

HDC's SBR is the standard MPEG-4 SBR toolchain with the DRM decode-path
flavor and 32 QMF subsamples per frame (reference:
support/faad2-hdc-support.patch:485 NUM_OF_HDC_SUBSAMPLES=32, patch:549-608
— no bs_extension_type/CRC prefix, one extra leading bit in
sbr_single_channel_element, raw payload runs to the end of the packet).

The 32-band analysis / 64-band synthesis QMF pair (ISO 14496-3 §4.6.18.2-4)
is implemented as dense modulation matmuls over the 640-tap prototype
(table from aac_tables.py).  When a packet carries no SBR fill element the
decoder still emits 44100 Hz by running the QMF pair with the high bands
zeroed — the ``forceUpSampling`` analog (patch:210).
"""

from __future__ import annotations

import functools

import numpy as np

from nrsc5_tpu.audio import aac_tables as T

NUM_SLOTS = 32  # QMF subsamples per 1024-sample HDC frame


@functools.lru_cache(maxsize=None)
def _analysis_mod() -> np.ndarray:
    """[64, 32] modulation: X[k] = Σ_n u[n]·exp(iπ/64·(k+0.5)(2n−1))."""
    n = np.arange(64)[:, None]
    k = np.arange(32)[None, :]
    return np.exp(1j * np.pi / 64 * (k + 0.5) * (2 * n - 1))


@functools.lru_cache(maxsize=None)
def _synthesis_mod() -> np.ndarray:
    """[64, 128] modulation: v[n] = 1/64·Re Σ_k X[k]·exp(iπ/128·(k+0.5)(2n−255))."""
    k = np.arange(64)[:, None]
    n = np.arange(128)[None, :]
    return np.exp(1j * np.pi / 128 * (k + 0.5) * (2 * n - 255))


class QMFAnalysis:
    """32-band downsampled analysis bank (320-tap prototype = every other
    tap of the 640-tap upsampled window)."""

    def __init__(self):
        self.x = np.zeros(320)
        self.win = T.SBR_QMF_WINDOW_US[::2].astype(np.float64) * 2.0

    def run(self, samples: np.ndarray) -> np.ndarray:
        """[32·nslots] time samples → [nslots, 32] complex subbands."""
        nslots = len(samples) // 32
        out = np.empty((nslots, 32), np.complex128)
        mod = _analysis_mod()
        for sl in range(nslots):
            self.x = np.roll(self.x, 32)
            self.x[:32] = samples[sl * 32: sl * 32 + 32][::-1]
            z = self.x * self.win
            u = z.reshape(5, 64).sum(axis=0)
            out[sl] = u @ mod
        return out


class QMFSynthesis:
    """64-band synthesis bank (640-tap prototype)."""

    def __init__(self):
        self.v = np.zeros(1280)
        self.win = T.SBR_QMF_WINDOW_US.astype(np.float64)

    def run(self, X: np.ndarray) -> np.ndarray:
        """[nslots, 64] complex subbands → [64·nslots] time samples."""
        nslots = X.shape[0]
        out = np.empty(nslots * 64)
        mod = _synthesis_mod()
        g = np.empty(640)
        for sl in range(nslots):
            v_new = (X[sl] @ mod).real / 64.0
            self.v = np.roll(self.v, 128)
            self.v[:128] = v_new
            for n in range(5):
                g[128 * n: 128 * n + 64] = self.v[256 * n: 256 * n + 64]
                g[128 * n + 64: 128 * n + 128] = \
                    self.v[256 * n + 192: 256 * n + 256]
            w = g * self.win
            out[sl * 64: (sl + 1) * 64] = w.reshape(10, 64).sum(axis=0)
        return out


class SBRDecoder:
    """Per-channel SBR state: QMF banks + (optional) HF reconstruction."""

    def __init__(self):
        self.analysis = QMFAnalysis()
        self.synthesis = QMFSynthesis()

    # ------------------------------------------------------------------
    def upsample_only(self, core: np.ndarray) -> np.ndarray:
        """1024 samples @22050 → 2048 @44100 through the QMF pair with
        the top 32 bands zeroed (faad forceUpSampling behavior)."""
        sub = self.analysis.run(core.astype(np.float64))  # [32, 32]
        X = np.zeros((sub.shape[0], 64), np.complex128)
        X[:, :32] = sub
        return self.synthesis.run(X).astype(np.float32)

    # ------------------------------------------------------------------
    def parse_payload(self, br, stereo: bool):
        """Parse an HDC SBR payload (patch:695-730).  Envelope SBR decode
        lands with the full HF reconstruction; see process()."""
        raise NotImplementedError("HDC SBR envelope decode: next stage")

    def process(self, core: np.ndarray, hdr, ch: int) -> np.ndarray:
        raise NotImplementedError("HDC SBR envelope decode: next stage")
