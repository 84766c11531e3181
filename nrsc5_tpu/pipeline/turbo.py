"""High-throughput streaming FM receiver built on the fused scan chain.

``TurboFMReceiver`` presents the same host interface as
:class:`nrsc5_tpu.pipeline.receiver.FMReceiver` (``push_cs16`` /
``push_cu8`` + frame/event callbacks) but, once FINE sync is established,
decodes whole P1 frames per device dispatch with
:func:`nrsc5_tpu.pipeline.scan_chain.fm_chain_scan` — one jit call per
1.486 s of signal instead of 16, which is what the throughput benchmark
measures.  Acquisition and loss recovery reuse the per-block receiver.

Extended service modes promote too: the PX1/PX2 interleaver-IV state is
handed off from the per-block receiver into the fused dispatch
(``sc.PxState``), so MP2/MP3/MP11 decode their P3 frames inside the same
jit call as PM (round-1 VERDICT item 7).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.pipeline import scan_chain as sc
from nrsc5_tpu.pipeline.receiver import SYNC_FINE, FMReceiver


class TurboFMReceiver:
    """Streaming FM receiver with a fused steady-state fast path."""

    def __init__(self, on_frame: Callable[[int, np.ndarray, float], None],
                 on_event: Callable[[str, dict], None] | None = None,
                 frames_per_dispatch: int = 1):
        self.on_frame = on_frame
        self.on_event = on_event or (lambda kind, info: None)
        self.n_blocks = frames_per_dispatch * C.P1_FM_BLOCKS
        self._slow = FMReceiver(self._slow_frame, self._slow_event)
        self._fast = False
        self._carry: sc.ChainCarry | None = None
        self._px_state: sc.PxState | None = None
        self._psmi = 1
        # host mirrors of the IV call phase for warm-up gating (frames
        # decoded before a full interleaver cycle are discarded, like the
        # reference's `ready` flag, src/decode.c:355-359)
        self._px_ready = {1: False, 2: False}
        self._px_phase = {1: 0, 2: 0}
        self._pending_resync = False
        self._mer_acc = [0.0, 0.0]
        self._mer_cnt = 0

    # ------------------------------------------------------------------
    def _slow_frame(self, chan, bits, margin):
        self.on_frame(chan, bits, margin)

    def _slow_event(self, kind, info):
        self.on_event(kind, info)

    def resync(self):
        self._fast = False
        self._carry = None
        self._px_state = None
        self._px_ready = {1: False, 2: False}
        self._mer_acc, self._mer_cnt = [0.0, 0.0], 0
        self._slow.resync()

    def reset(self):
        self._fast = False
        self._carry = None
        self._px_state = None
        self._px_ready = {1: False, 2: False}
        self._mer_acc, self._mer_cnt = [0.0, 0.0], 0
        self._slow.reset()

    # ------------------------------------------------------------------
    def push_cu8(self, data: np.ndarray):
        self._slow.push_cu8(np.asarray(data, np.uint8)) if not self._fast \
            else self._push_cu8_fast(data)

    def _push_cu8_fast(self, data):
        from nrsc5_tpu.ops import frontend as FE
        r = self._slow
        data = np.concatenate([r._cu8_leftover, np.asarray(data, np.uint8)])
        usable = len(data) & ~3
        r._cu8_leftover = data[usable:]
        if usable:
            y, r._fe_state = FE.fm_decimate_jit(
                FE.cu8_to_cf(jnp.asarray(data[:usable])), r._fe_state)
            self.push_cs16(np.asarray(y))

    def push_cs16(self, samples: np.ndarray):
        r = self._slow
        if not self._fast:
            r.push_cs16(samples)
            # promote once FINE-locked at a frame boundary (bc==0 also
            # pair-aligns the PX interleaver-IV calls in extended modes)
            if (r.sync_state == SYNC_FINE and r.bc == 0
                    and C.COMPATIBILITY_MODE[r.psmi] in (1, 2, 3, 5, 6, 11)
                    and not r.ring.size == 0):
                self._enter_fast()
            return
        r.ring = np.concatenate([r.ring,
                                 np.asarray(samples, np.complex64)])
        needed = sc.buffer_len(self.n_blocks)
        while len(r.ring) >= needed:
            self._fast_dispatch()
            if not self._fast:
                # resync requested: remaining samples re-enter the slow path
                r.push_cs16(np.zeros(0, np.complex64))
                return

    # ------------------------------------------------------------------
    def _enter_fast(self):
        r = self._slow
        self._carry = sc.ChainCarry(
            offset=jnp.asarray(0, jnp.int32),
            acq=r.acq_state,
            sync=r.sync_arrays,
            samperr_fb=jnp.asarray(r.samperr_fb, jnp.int32),
            angle_fb=jnp.asarray(r.angle_fb, jnp.float32),
        )
        r.samperr_fb = 0
        r.angle_fb = 0.0
        self._psmi = r.psmi
        fl1, fl2 = sc.px_frame_lens(self._psmi)
        if fl1 or fl2:
            # hand the per-block receiver's interleaver-IV state into the
            # fused dispatch; bc==0 guarantees pair alignment and empty
            # pending half-pairs
            self._px_state = sc.PxState(
                px1_internal=jnp.asarray(r.px1.internal, jnp.int8),
                px1_phase=jnp.asarray(r.px1.call_phase, jnp.int32),
                px2_internal=(jnp.asarray(r.px2.internal, jnp.int8)
                              if fl2 else jnp.zeros(0, jnp.int8)),
                px2_phase=jnp.asarray(r.px2.call_phase if fl2 else 0,
                                      jnp.int32),
            )
            self._px_ready = {1: r.px1.ready, 2: fl2 and r.px2.ready}
            self._px_phase = {1: r.px1.call_phase,
                              2: r.px2.call_phase if fl2 else 0}
        else:
            self._px_state = None
        self._fast = True

    def _fast_dispatch(self):
        r = self._slow
        # bit-pack the frame outputs on accelerators: program outputs
        # transfer eagerly over the tunnel, so unpacked P1 frames would
        # dominate dispatch time (see ops/bits.py)
        packed = jax.default_backend() != "cpu"
        out, carry = sc.fm_chain_scan(
            jnp.asarray(r.ring[:sc.buffer_len(self.n_blocks)]),
            self._carry, self.n_blocks, self._psmi, 0, self._px_state,
            packed)

        consumed = int(np.asarray(carry.offset))
        self._carry = sc.rebase_carry(carry, consumed)
        r.ring = r.ring[consumed:]

        if packed:
            from nrsc5_tpu.ops.bits import unpack_out
            out = dict(out)
            unpack_out(out)
        pids = np.asarray(out["pids"])
        p1 = np.asarray(out["p1"])
        margins = np.asarray(out["p1_margin"])
        errors = np.asarray(out["p1_bit_errors"])
        error_lb = np.asarray(out["diag"]["error_lb"])
        error_ub = np.asarray(out["diag"]["error_ub"])
        for b in range(self.n_blocks):
            self.on_event("block", {})
            self.on_frame(-1, pids[b], 0.0)
            # MER every 16 blocks, same aggregation as the per-block path
            # (reference: src/sync.c:486-501)
            self._mer_acc[0] += float(error_lb[b])
            self._mer_acc[1] += float(error_ub[b])
            self._mer_cnt += 1
            if self._mer_cnt == 16:
                ppb = C.partitions_per_band(self._psmi)
                signal = 2 * C.BLKSZ * ppb * C.PARTITION_DATA_CARRIERS * 16
                self.on_event("mer", {
                    "lower": 10 * np.log10(signal / self._mer_acc[0])
                    if self._mer_acc[0] > 0 else 0.0,
                    "upper": 10 * np.log10(signal / self._mer_acc[1])
                    if self._mer_acc[1] > 0 else 0.0})
                self._mer_acc = [0.0, 0.0]
                self._mer_cnt = 0
        for f in range(p1.shape[0]):
            self.on_event("ber", {
                "cber": float(errors[f]) / C.P1_FRAME_LEN_ENCODED_FM})
            self.on_frame(0, p1[f], float(margins[f]))
        if self._px_state is not None:
            self._px_state = out["px_state"]
            from nrsc5_tpu.ops import interleavers as IL
            fls = sc.px_frame_lens(self._psmi)
            for chan, key in ((1, "px1"), (2, "px2")):
                if key not in out:
                    continue
                bits = np.asarray(out[key])
                margins_px = np.asarray(out[key + "_margin"])
                _, _, calls = IL.p3_iv_tables(fls[chan - 1])
                phase0 = self._px_phase[chan]
                for j in range(bits.shape[0]):
                    # the reference marks the interleaver ready at the
                    # start of the call after a full cycle
                    # (src/decode.c:355-359): discard warm-up frames
                    if self._px_ready[chan] or phase0 + j >= calls:
                        self.on_frame(chan, bits[j], float(margins_px[j]))
                self._px_ready[chan] = (self._px_ready[chan]
                                        or phase0 + bits.shape[0] >= calls)
                self._px_phase[chan] = (phase0 + bits.shape[0]) % calls
        # link-quality watchdog: soft-decision rate-2/5 K=7 fails far below
        # 15% channel BER, so anything above it is a dead carrier — drop to
        # reacquisition promptly (transport RS resync also lands here)
        if errors.size and errors.max() / C.P1_FRAME_LEN_ENCODED_FM > 0.15:
            self.on_event("lost_sync", {})
            self.resync()
