"""Offline multi-station capture replay over a device mesh.
BASELINE config 5 ("pod-scale streaming") structure: a long multi-station
capture is sharded over a (station, time) mesh, each shard decodes its
chunk independently (parallel/receive.py), and the host merges each
station's frame sequence back into the transport layer (frame → elastic
buffer → HDC/ID3/SIS events) in time order.
On a single host this exercises the full path with a virtual device mesh;
on a pod slice the same code spans hosts via :mod:`.distributed`
(jax.distributed multi-controller setup + DCN-sharded station inputs;
tested two-process in tests/test_distributed.py).
"""
from __future__ import annotations
from dataclasses import dataclass, field
import numpy as np
from nrsc5_tpu import constants as C
from nrsc5_tpu.parallel import receive as pr
from nrsc5_tpu.transport import frame as TF
from nrsc5_tpu.transport.output import Output
from nrsc5_tpu.transport.pids import PIDSDecoder
@dataclass
class StationSink:
    """Per-station transport pipeline + event collection."""
    events: list = field(default_factory=list)
    def __post_init__(self):
        self.output = Output(self.events.append)
        self.pids = PIDSDecoder(self.events.append)
        self.frame = TF.FrameDecoder(self.output)
def replay_capture(samples: np.ndarray, tails: np.ndarray | None,
                   mesh, n_blocks_per_shard: int, psmi: int = 1,
                   margin_floor: float = 10.0) -> list[StationSink]:
    """Decode a multi-station FM capture and run host transport per station.
    samples: [S, n_time * shard_chunk_len] complex64 (station-major),
      laid out per parallel/receive.py's framing contract.
    Returns one StationSink per station with its event list populated.
    """
    n_time = mesh.shape["time"]
    if tails is None:
        tails = np.zeros((samples.shape[0], pr.HALO), np.complex64)
    step = pr.sharded_fm_chain(mesh, n_blocks_per_shard, psmi)
    p1, margin, pids, quality = step(samples, tails)
    p1 = np.asarray(p1)          # [S, n_time*F, 146176]
    margin = np.asarray(margin)  # [S, n_time*F]
    pids = np.asarray(pids)      # [S, n_time*n_blocks, 80]
    sinks = []
    frames_per_shard = n_blocks_per_shard // C.P1_FM_BLOCKS
    for s in range(samples.shape[0]):
        sink = StationSink()
        for f in range(n_time * frames_per_shard):
            # blocks tick the output clock: 16 per frame
            if margin[s, f] >= margin_floor:
                sink.frame.push_frame(p1[s, f], TF.P1)
            for b in range(C.P1_FM_BLOCKS):
                sink.pids.frame_push(pids[s, f * C.P1_FM_BLOCKS + b])
                sink.output.advance()
        sinks.append(sink)
    return sinks, float(quality)
