"""Multi-chip scaling: shard the receive chain over a (station, time) mesh.

The reference is strictly single-session/single-thread (SURVEY.md §2,
"parallelism inventory") — this module is new, TPU-first capability:

  * **Station data parallelism** — independent stations shard over the
    ``station`` mesh axis; within a shard they batch via ``vmap`` so every
    chip processes a dense station block (BASELINE config 4).
  * **Time-block sequence parallelism** — a long capture shards along time
    over the ``time`` axis.  Each time shard needs ``2*FFTCP`` samples of
    right-neighbor context (the acquire window overlap + clock-drift slack);
    that halo rides the ICI as a single ``ppermute`` — the overlap-save
    contract from SURVEY.md §2 item 2.  Carried DSP state is *not* streamed
    between shards: each shard re-establishes fine sync inside its own
    chunk (chunk boundaries are frame-aligned by the host driver), and L2
    frame merge happens host-side by PDU sequence number, so time shards
    are embarrassingly parallel after one neighbor exchange.

Collectives used: ``ppermute`` (halo), ``psum`` (link-quality/BER
aggregation across the whole mesh).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nrsc5_tpu import constants as C
from nrsc5_tpu.pipeline import scan_chain as sc
from nrsc5_tpu.pipeline import scan_chain_am as sca

HALO = C.FFTCP_FM + sc.SLACK  # right-neighbor context per time shard
HALO_AM = C.FFTCP_AM + sca.SLACK_AM


def make_mesh(n_station: int, n_time: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_station * n_time, (
        f"need {n_station * n_time} devices, have {devices.size}")
    grid = devices[: n_station * n_time].reshape(n_station, n_time)
    return Mesh(grid, axis_names=("station", "time"))


def shard_chunk_len(n_blocks: int) -> int:
    """Samples per (station, time) shard, excluding the halo."""
    return n_blocks * C.BLKSZ * C.FFTCP_FM


def sharded_fm_chain(mesh: Mesh, n_blocks: int, psmi: int = 1):
    """Build the jitted sharded receive step.

    Returns ``step(samples)`` where ``samples`` is
    [S, n_time * shard_chunk_len(n_blocks)] complex64 (S divisible by the
    station axis), laid out so that every shard chunk starts at a block
    boundary with the steady-state symbol offset (FFTCP//2).  Output pytree
    is replicated per shard along time: p1 [S, n_time, F, 146176], pids
    [S, n_time, n_blocks, 80], plus a mesh-wide mean EVM power ``quality``.
    """
    n_time = mesh.shape["time"]
    chunk = shard_chunk_len(n_blocks)
    assert n_blocks % C.P1_FM_BLOCKS == 0, \
        "time shards must hold whole P1 frames"

    def local_step(samples_loc, tail_loc):
        # samples_loc: [S_loc, chunk]; tail_loc: [S_loc, HALO] — the samples
        # following the whole capture (used only by the last time shard)
        head = samples_loc[:, :HALO]
        if n_time > 1:
            perm = [(j, j - 1) for j in range(1, n_time)]
            recv = jax.lax.ppermute(head, "time", perm)
        else:
            recv = jnp.zeros_like(head)
        t_idx = jax.lax.axis_index("time")
        recv = jnp.where(t_idx == n_time - 1, tail_loc, recv)
        ext = jnp.concatenate([samples_loc, recv], axis=1)

        def one_station(s):
            out, carry = sc.fm_chain_scan(s, sc.chain_init_carry(),
                                          n_blocks, psmi, 0)
            return out

        out = jax.vmap(one_station)(ext)
        err = out["diag"]["error"].sum()
        denom = jnp.asarray(
            samples_loc.shape[0] * n_blocks, jnp.float32)
        quality = jax.lax.psum(err, ("station", "time")) / jax.lax.psum(
            denom, ("station", "time"))
        # sharded dims (station, time) concatenate to global
        # p1 [S, n_time*F, 146176], pids [S, n_time*n_blocks, 80]
        return out["p1"], out["p1_margin"], out["pids"], quality

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("station", "time"), P("station", None)),
        out_specs=(P("station", "time"), P("station", "time"),
                   P("station", "time"), P()),
        # the chain's scan carries start from device-invariant constants;
        # skip the varying-manual-axes replication check
        check_vma=False,
    )
    return jax.jit(step)


def selfsync_halo() -> int:
    """Right-neighbor context a self-synchronizing time shard needs:
    worst-case block-boundary skip + symbol offset + scan slack + the
    coarse probe window."""
    from nrsc5_tpu.ops.acquire import WINDOW_FM
    return C.BLKSZ * C.FFTCP_FM + 2 * C.FFTCP_FM + sc.SLACK + WINDOW_FM


def sharded_fm_chain_selfsync(mesh: Mesh, n_blocks: int, psmi: int = 1):
    """Self-synchronizing (station, time) sharded receive: every time
    shard cold-starts *on device* inside its own chunk — coarse CP timing,
    integer-CFO/block-offset needle search, bc/psmi probe — so the host
    does NOT pre-align chunks to frame boundaries or steady-state offsets
    (round-1 gap; the reference analog is the per-session NONE→COARSE→FINE
    machine, src/input.c:172-188).

    samples: [S, n_time * chunk, 2] float32 rc, ALREADY conjugated, at
    arbitrary timing/CFO.  Each shard decodes the complete P1 frames whose
    16 aligned blocks fall inside its chunk: F = n_blocks//16 − 1 frames
    (one frame of headroom pays for the unknown block/bc alignment).
    Returns (p1 [S, n_time*F, 146176], margins [S, n_time*F],
    first_bc [S, n_time], cfo [S, n_time], locked [S, n_time],
    quality scalar).
    """
    from nrsc5_tpu.ops.acquire import WINDOW_FM
    from nrsc5_tpu.ops.decode_fm import p1_decode
    from nrsc5_tpu.pipeline import scan_chain_rc as rcc

    n_time = mesh.shape["time"]
    chunk = shard_chunk_len(n_blocks)
    n_frames = n_blocks // C.P1_FM_BLOCKS - 1
    assert n_frames >= 1, "need at least 32 blocks per time shard"
    halo = selfsync_halo()

    def local_step(samples_loc, tail_loc):
        head = samples_loc[:, :halo]
        if n_time > 1:
            perm = [(j, j - 1) for j in range(1, n_time)]
            recv = jax.lax.ppermute(head, "time", perm)
        else:
            recv = jnp.zeros_like(head)
        t_idx = jax.lax.axis_index("time")
        recv = jnp.where(t_idx == n_time - 1, tail_loc, recv)
        ext = jnp.concatenate([samples_loc, recv], axis=1)

        def one_station(s):
            start, first_bc, cfo, angle, locked = \
                rcc.cold_start_device_rc(s)
            carry = rcc.chain_rc_init_carry(psmi=psmi)._replace(
                offset=start, cfo=cfo,
                prev_angle=angle.astype(jnp.float32))
            pm, diag, _, _ = rcc.frontend_scan_rc(s, carry, n_blocks, psmi)
            skip = (C.P1_FM_BLOCKS - first_bc) % C.P1_FM_BLOCKS
            frames = jax.lax.dynamic_slice(
                pm, (skip, 0), (n_frames * C.P1_FM_BLOCKS, pm.shape[1]))
            frames = frames.reshape(n_frames, -1)
            p1, margin, _ = jax.vmap(
                lambda m: p1_decode(m, chunked=True))(frames)
            return p1, margin, first_bc, cfo, locked, \
                (diag["error_lb"] + diag["error_ub"]).sum()

        p1, margin, first_bc, cfo, locked, err = \
            jax.vmap(one_station)(ext)
        denom = jnp.asarray(samples_loc.shape[0] * n_blocks, jnp.float32)
        quality = jax.lax.psum(err.sum(), ("station", "time")) \
            / jax.lax.psum(denom, ("station", "time"))
        # scalars-per-shard get a trailing axis so the time axis has a
        # dimension to concatenate along
        return (p1, margin, first_bc[:, None], cfo[:, None],
                locked[:, None], quality)

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("station", "time"), P("station", None)),
        out_specs=(P("station", "time"), P("station", "time"),
                   P("station", "time"), P("station", "time"),
                   P("station", "time"), P()),
        check_vma=False,
    )
    return jax.jit(step)


def shard_chunk_len_am(n_frames: int) -> int:
    """Samples per (station, time) shard for the AM chain."""
    return n_frames * 8 * C.BLKSZ * C.FFTCP_AM


def sharded_am_chain(mesh: Mesh, n_frames: int, ma3: bool = False):
    """AM analog of :func:`sharded_fm_chain`: shards stations and
    frame-aligned time chunks over the mesh with a ppermute halo.

    Each time shard re-initializes its diversity delay lines, so the first
    3 frames of every shard are warm-up (the host overlaps shard content by
    3 frames when exact continuity matters).  samples: [S, n_time * chunk];
    returns p1 [S, n_time*F, 8, 3750], p3 [S, n_time*F, len], pids
    [S, n_time*F*8, 80].
    """
    n_time = mesh.shape["time"]
    chunk = shard_chunk_len_am(n_frames)

    def local_step(samples_loc, tail_loc):
        head = samples_loc[:, :HALO_AM]
        if n_time > 1:
            perm = [(j, j - 1) for j in range(1, n_time)]
            recv = jax.lax.ppermute(head, "time", perm)
        else:
            recv = jnp.zeros_like(head)
        t_idx = jax.lax.axis_index("time")
        recv = jnp.where(t_idx == n_time - 1, tail_loc, recv)
        ext = jnp.concatenate([samples_loc, recv], axis=1)

        def one_station(s):
            out, _ = sca.am_chain_scan(s, sca.am_chain_init_carry(),
                                       n_frames, ma3)
            return out

        out = jax.vmap(one_station)(ext)
        return out["p1"], out["p3"], out["pids"]

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("station", "time"), P("station", None)),
        out_specs=(P("station", "time"), P("station", "time"),
                   P("station", "time")),
        check_vma=False,
    )
    return jax.jit(step)


def sharded_fm_chain_px(mesh: Mesh, n_blocks: int, psmi: int = 3):
    """Extended-mode (PX / interleaver-IV) receive across time shards.

    The interleaver-IV's internal two-frame delay (decode.h:9-17 in the
    reference) means a time shard cannot decode its first IV cycle of
    PX frames from its own samples: each shard prepends a LEFT halo —
    two whole P1 frames ppermuted from the previous time shard — to
    re-prime the IV state, then drops the warm-up outputs
    (recompute-overlap handoff, the same halo contract as the FIR /
    acquire tails; SURVEY §2 parallelism item 2).  Shard 0's dropped
    warm-up frames are the stream's own cold-start warm-up.

    samples: [S, n_time * shard_chunk_len(n_blocks)] complex64, chunks
    frame-aligned at the steady offset.  Returns (p1 [S, n_time*F,
    146176], px1 [S, n_time*Fpx, fl1], quality).
    """
    from nrsc5_tpu.ops import interleavers as IL
    n_time = mesh.shape["time"]
    chunk = shard_chunk_len(n_blocks)
    assert n_blocks % C.P1_FM_BLOCKS == 0
    fl1, _ = sc.px_frame_lens(psmi)
    assert fl1, f"psmi {psmi} has no PX1 channel"
    warm_px = IL.p3_iv_tables(fl1)[2]           # PX warm-up frames
    left_blocks = 2 * warm_px                   # one PX frame per pair
    left_blocks += (-left_blocks) % C.P1_FM_BLOCKS  # whole P1 frames
    left = left_blocks * C.BLKSZ * C.FFTCP_FM
    warm_p1 = left_blocks // C.P1_FM_BLOCKS
    dec_blocks = n_blocks + left_blocks

    def local_step(samples_loc, tail_loc):
        head = samples_loc[:, :HALO]
        ltail = samples_loc[:, -left:]
        if n_time > 1:
            recv = jax.lax.ppermute(
                head, "time", [(j, j - 1) for j in range(1, n_time)])
            recv_left = jax.lax.ppermute(
                ltail, "time", [(j, j + 1) for j in range(n_time - 1)])
        else:
            recv = jnp.zeros_like(head)
            recv_left = jnp.zeros_like(ltail)
        t_idx = jax.lax.axis_index("time")
        recv = jnp.where(t_idx == n_time - 1, tail_loc, recv)
        recv_left = jnp.where(t_idx == 0, jnp.zeros_like(recv_left),
                              recv_left)
        ext = jnp.concatenate([recv_left, samples_loc, recv], axis=1)

        def one_station(s):
            out, _ = sc.fm_chain_scan(
                s, sc.chain_init_carry(), dec_blocks, psmi, 0,
                px_state=sc.px_init_state(psmi))
            return (out["p1"][warm_p1:],      # drop left-halo P1 frames
                    out["px1"][warm_px:])     # drop IV warm-up PX frames

        p1, px1 = jax.vmap(one_station)(ext)
        err = jnp.zeros((), jnp.float32)
        quality = jax.lax.psum(err, ("station", "time"))
        return p1, px1, quality

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("station", "time"), P("station", None)),
        out_specs=(P("station", "time"), P("station", "time"), P()),
        check_vma=False,
    )
    return jax.jit(step)
