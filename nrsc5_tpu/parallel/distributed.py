"""Multi-host (DCN) execution of the sharded receive chain.

The reference is a single process (SURVEY.md §2: no distributed backend);
this module is new TPU-first capability, completing the communication
story of :mod:`nrsc5_tpu.parallel.receive`:

  * **intra-host / ICI** — the ``time`` mesh axis: halo exchange rides
    ``ppermute`` between devices of one host (receive.py).
  * **inter-host / DCN** — the ``station`` mesh axis spans processes:
    each host ingests and feeds only its own stations' I/Q (radio
    front-ends are naturally distributed), and only small mesh-wide
    reductions (link quality psum) cross hosts.

Process setup follows the standard JAX multi-controller recipe:
``jax.distributed.initialize`` with a coordinator address, then one
global mesh over ``jax.devices()`` (all hosts' devices, process-major),
``jax.make_array_from_process_local_data`` to lift each host's local
station block into the global sharded array, and per-host consumption of
the addressable output shards.  On CPU test rigs the cross-process
collectives run over gloo; on TPU pods the same program rides ICI/DCN —
the code is identical, which is the point of the multi-controller model.

Self-test entry point (used by tests/test_distributed.py, runnable by
hand)::

    python -m nrsc5_tpu.parallel.distributed --num-processes 2 \
        --process-id {0,1} --coordinator localhost:12377

Every process modulates the same deterministic multi-frame capture,
feeds *its own* station's samples, decodes over the global
(station, time) mesh, and asserts its local P1/PIDS output bit-exact.
"""

from __future__ import annotations

import numpy as np

from nrsc5_tpu import constants as C


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_count: int | None = None) -> None:
    """Initialize this process as one controller of a multi-host mesh.

    Must run before any JAX device/backend query.  On CPU (tests,
    development) selects the gloo cross-process collective implementation
    and optionally forces ``local_device_count`` virtual devices.
    """
    import os

    import jax

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; the
        # config knob is authoritative (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id)


def global_station_mesh(n_time: int):
    """(station, time) mesh over all hosts' devices, station-major.

    ``jax.devices()`` orders devices process-major, so slicing the device
    list into ``n_station`` rows puts the process boundary on the
    *station* axis: halo ``ppermute`` along ``time`` stays on-host (ICI),
    and only mesh-wide reductions cross hosts (DCN).
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    assert devices.size % n_time == 0, (devices.size, n_time)
    grid = devices.reshape(devices.size // n_time, n_time)
    return Mesh(grid, axis_names=("station", "time"))


def lift_local_stations(mesh, local_samples: np.ndarray,
                        local_tails: np.ndarray):
    """Lift one host's station block into global sharded arrays.

    local_samples: [S_local, T] — this host's stations only.
    Returns (samples, tails) global jax.Arrays laid out for
    :func:`nrsc5_tpu.parallel.receive.sharded_fm_chain`.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_proc = jax.process_count()
    s_global = local_samples.shape[0] * n_proc
    samples = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("station", "time")), local_samples,
        global_shape=(s_global,) + local_samples.shape[1:])
    tails = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("station")), local_tails,
        global_shape=(s_global,) + local_tails.shape[1:])
    return samples, tails


def local_view(arr) -> np.ndarray:
    """Assemble this host's addressable shards of a global output array
    into one numpy block (sorted by global index; the station rows owned
    by this process, concatenated along every sharded axis)."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index)
    ndim = arr.ndim
    # group shards by their station slice, concatenate time-wise
    rows: dict[tuple, list] = {}
    for s in shards:
        rows.setdefault(s.index[0].indices(arr.shape[0]), []).append(s)
    blocks = []
    for _, row in sorted(rows.items()):
        parts = [np.asarray(s.data) for s in row]
        blocks.append(np.concatenate(parts, axis=1) if ndim > 1
                      and len(parts) > 1 else parts[0])
    return np.concatenate(blocks, axis=0)


def distributed_fm_replay(mesh, local_samples: np.ndarray,
                          local_tails: np.ndarray, n_blocks: int,
                          psmi: int = 1):
    """Run the sharded FM chain across hosts; return this host's outputs.

    Returns (p1 [S_local, n_time*F, 146176], margin, pids, quality) with
    quality the mesh-wide (cross-host psum) mean EVM power.
    """
    from nrsc5_tpu.parallel import receive as pr

    samples, tails = lift_local_stations(mesh, local_samples, local_tails)
    step = pr.sharded_fm_chain(mesh, n_blocks, psmi)
    p1, margin, pids, quality = step(samples, tails)
    return (local_view(p1), local_view(margin), local_view(pids),
            float(np.asarray(quality)))


# ---------------------------------------------------------------------------
# Self-test worker (one process of the multi-controller job)
# ---------------------------------------------------------------------------

def _selftest(num_processes: int, process_id: int, coordinator: str,
              n_time: int = 2, n_blocks: int = 16) -> None:
    import time

    init_distributed(coordinator, num_processes, process_id,
                     local_device_count=n_time)
    import jax

    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm
    from nrsc5_tpu.parallel import receive as pr

    # deterministic capture, same on every host; each host *feeds* only
    # its own station (station content differs per host via the seed)
    rng = np.random.default_rng(1000 + process_id)
    n_frames = n_time
    p1 = rng.integers(0, 2, (n_frames, C.P1_FRAME_LEN_FM)).astype(np.uint8)
    pids = rng.integers(0, 2, (n_frames, 16, C.PIDS_FRAME_LEN)) \
        .astype(np.uint8)
    mats = [build_pm_matrix(p1[i], pids[i]) for i in range(n_frames)]
    trail = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8),
        rng.integers(0, 2, (16, C.PIDS_FRAME_LEN)).astype(np.uint8))[:32]
    matrix = np.concatenate(mats + [trail])
    bc_seq = np.concatenate([np.tile(np.arange(16), n_frames), [0]])
    sig = modulate_fm(matrix, bc_seq, 1)

    chunk = pr.shard_chunk_len(n_blocks)
    total = n_time * chunk
    buf = np.zeros(total + pr.HALO, np.complex64)
    start = C.FFTCP_FM // 2
    buf[start:] = sig[:total + pr.HALO - start]
    local_samples = buf[None, :total]
    local_tails = buf[None, total:]

    mesh = global_station_mesh(n_time)
    assert mesh.shape["station"] == num_processes

    t0 = time.perf_counter()
    p1_out, margin, pids_out, quality = distributed_fm_replay(
        mesh, local_samples, local_tails, n_blocks)
    wall = time.perf_counter() - t0

    assert p1_out.shape == (1, n_time, C.P1_FRAME_LEN_FM), p1_out.shape
    for f in range(n_frames):
        assert np.array_equal(p1_out[0, f], p1[f]), \
            f"host {process_id} frame {f} not bit-exact"
    pids_out = pids_out.reshape(n_time * n_blocks, -1)
    for f in range(n_frames):
        assert np.array_equal(pids_out[f * 16:(f + 1) * 16], pids[f])
    assert quality < 0.05, quality

    # steady-state wall for the scaling row (compile excluded)
    samples_g, tails_g = lift_local_stations(
        mesh, local_samples, local_tails)
    step = pr.sharded_fm_chain(mesh, n_blocks, 1)
    t0 = time.perf_counter()
    out = step(samples_g, tails_g)
    float(np.asarray(out[3]))
    steady = time.perf_counter() - t0
    print(f"DCN_OK process={process_id}/{num_processes} "
          f"devices={jax.device_count()} frames={n_frames} "
          f"quality={quality:.4f} first_wall={wall:.1f}s "
          f"steady_wall={steady:.3f}s", flush=True)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--coordinator", default="localhost:12377")
    ap.add_argument("--n-time", type=int, default=2,
                    help="devices per host (time-shard axis)")
    ap.add_argument("--n-blocks", type=int, default=16)
    args = ap.parse_args(argv)
    _selftest(args.num_processes, args.process_id, args.coordinator,
              args.n_time, args.n_blocks)


if __name__ == "__main__":
    main()
