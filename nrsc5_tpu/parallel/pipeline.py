"""Pipeline (stage) parallelism: frontend | FEC across a ``stage`` mesh axis.

SURVEY §2 parallelism item 4.  The reference is a single sequential DSP
chain (src/input.c feeds src/acquire.c feeds src/decode.c on one thread);
here the two halves of the receive chain are placed on different devices
of a ``stage`` mesh axis and overlapped across microbatches:

    stage 0 (frontend): acquire derotate/fold/FFT -> Costas sync ->
        equalize -> soft demap       (one P1 frame = 16 L1 blocks per step)
    stage 1 (FEC):      deinterleave -> chunk-parallel Viterbi ->
        descramble -> PIDS decode

Each scan step, stage 0 demodulates frame ``i`` while stage 1 decodes
frame ``i-1`` (received over ICI via ``ppermute`` at the end of the
previous step) — a classic depth-2 pipeline with a one-step fill bubble.
Inside ``shard_map`` both devices run the same SPMD program; a runtime
``lax.cond`` on ``axis_index("stage")`` dispatches each device to its
stage's compute, so the frontend's FFT matmuls and the FEC's trellis scan
genuinely run concurrently on different chips.

This is optional by design (SURVEY: soft-bit volume is ~300x smaller than
the front-end sample volume, so stage sharding is not the throughput
bottleneck — station batching is); it exists for completeness and as the
pattern for deeper stage splits.  Bit-exactness vs the fused single-device
chain is pinned by tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nrsc5_tpu import constants as C
from nrsc5_tpu.ops.decode_fm import p1_decode, pids_decode
from nrsc5_tpu.pipeline import scan_chain as sc

def _frame_fec(pm_frame):
    """pm_frame: [16, 23040] int8 -> (p1 bits, margin, pids [16, 80])."""
    p1, margin, _ = p1_decode(pm_frame.reshape(-1), chunked=True)
    pids = jax.vmap(pids_decode)(pm_frame)
    return p1, margin, pids


def pipelined_receive(samples, carry: sc.ChainCarry, n_frames: int,
                      mesh: Mesh, psmi: int = 1):
    """Decode ``n_frames`` P1 frames with frontend and FEC pipelined
    across the 2-device ``stage`` axis of ``mesh``.

    samples: [buffer_len(16 * n_frames)] complex64, steady-state framing
    (first symbol at FFTCP//2 + carry.offset; first block bc=0).
    Returns dict with p1 [n_frames, 146176] uint8, p1_margin, pids
    [n_frames, 16, 80], and the final frontend ChainCarry.
    """
    assert mesh.shape["stage"] == 2, "pipeline depth 2: frontend | FEC"

    zeros_pm = jnp.zeros((16, C.BLKSZ * 720), jnp.int8)  # [blocks, 23040]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(None, "stage"), P("stage")),
        check_vma=False)
    def run(samples, carry):
        idx = jax.lax.axis_index("stage")

        def step(st, t):
            cy, pm_prev = st

            def frontend(args):
                cy, _pm = args
                pm, _, _, ncy = sc.fm_frontend_scan(samples, cy, 16, psmi)
                return (ncy, pm,
                        jnp.zeros(C.P1_FRAME_LEN_FM, jnp.uint8),
                        jnp.asarray(0.0, jnp.float32),
                        jnp.zeros((16, C.PIDS_FRAME_LEN), jnp.uint8))

            def fec(args):
                cy, pm_prev = args
                p1, margin, pids = _frame_fec(pm_prev)
                return cy, jnp.zeros_like(pm_prev), p1, margin, pids

            # the drain step (t == n_frames) runs no frontend: stage 0
            # takes the fec branch on junk so the returned carry stays at
            # exactly n_frames consumed frames
            cy, pm, p1, margin, pids = jax.lax.cond(
                (idx == 0) & (t < n_frames), frontend, fec, (cy, pm_prev))
            # hand the fresh frame to the FEC stage for the next step
            # (stage 1's pm is junk and is dropped on stage 0's floor)
            pm_next = jax.lax.ppermute(pm, "stage", [(0, 1), (1, 0)])
            return (cy, pm_next), (p1, margin, pids)

        # n_frames + 1 steps: the last step only drains the FEC stage
        (cy, _), outs = jax.lax.scan(step, (carry, zeros_pm),
                                     jnp.arange(n_frames + 1))
        outs = jax.tree.map(lambda x: x[:, None], outs)  # stage axis
        return outs, jax.tree.map(lambda x: x[None], cy)

    (p1, margin, pids), carries = run(samples, carry)
    # outputs gathered [n_frames+1, 2(stage), ...]: stage 1 owns the
    # decoded frames, offset by the fill bubble; stage 0 owns the carry
    return {
        "p1": p1[1:, 1],
        "p1_margin": margin[1:, 1],
        "pids": pids[1:, 1],
    }, jax.tree.map(lambda x: x[0], carries)


def make_stage_mesh(devices=None) -> Mesh:
    """A 2-device ``stage`` mesh from the first two local devices."""
    if devices is None:
        devices = jax.devices()[:2]
    return Mesh(np.asarray(devices), ("stage",))
