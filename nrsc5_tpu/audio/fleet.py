"""Fleet audio: batched device PCM for a served multi-station receiver.

The reference decodes audio with one FAAD2 instance per subscribed
program on the host (src/output.c:126-163); serving N stations that way
costs N x 3.5 ms/packet of host CPU.  :class:`FleetAudioDecoder` sits on
a :class:`~nrsc5_tpu.serve.MultiStationReceiver`'s event stream,
collects each station's program HDC packets, and decodes them in
batches through :class:`~nrsc5_tpu.audio.batch.BatchedAudioDecoder` —
one jitted device dispatch per fleet batch — emitting AUDIO events
tagged with their station off the dispatch critical path.

Usage::

    fleet_audio = FleetAudioDecoder(n_stations, callback, program=0)
    rx = MultiStationReceiver(n_stations, fleet_audio.wrap,
                              hdc_factory=None, ...)
    ...push samples...
    rx.flush(); fleet_audio.flush()

``hdc_factory=None`` disables the per-station host codec (HDC packet
events still flow — this class consumes them).
"""

from __future__ import annotations

import numpy as np

from nrsc5_tpu.api.events import Event, EventType, make


class FleetAudioDecoder:
    """Batch-decode one program's HDC stream per station.

    callback(station, event): receives every event forwarded from the
    receiver plus the AUDIO events this class synthesizes.  ``k``
    packets per station per device dispatch (~k * 46.4 ms of audio
    latency).  Corrupt packets decode to silence, matching the
    reference's gap behavior (src/output.c:148-162).
    """

    def __init__(self, n_stations: int, callback, program: int = 0,
                 k: int = 8, backend=None):
        from nrsc5_tpu.audio.batch import BatchedAudioDecoder
        self.n = n_stations
        self._cb = callback
        self._program = program
        self._k = k
        self._dec = BatchedAudioDecoder(n_stations, backend=backend)
        self._queues: list[list[bytes]] = [[] for _ in range(n_stations)]
        # a packet that always parses to silence (empty -> parse error
        # -> corrupt-packet silence lane in the batch decoder)
        self._silence = b""

    # ------------------------------------------------------------------
    def wrap(self, station: int, event: Event):
        """The receiver callback: intercept HDC, forward everything."""
        if event.type == EventType.HDC and \
                getattr(event, "program", self._program) == self._program:
            data = bytes(event.data) if not event.crc_error \
                else self._silence
            self._queues[station].append(data)
        self._cb(station, event)
        self._maybe_decode()

    def _maybe_decode(self, force: bool = False):
        depth = min(len(q) for q in self._queues)
        k = self._k
        if depth >= k or (force and depth > 0):
            take = min(depth, k)
            batch = [self._queues[i][:take] for i in range(self.n)]
            for i in range(self.n):
                del self._queues[i][:take]
            pcm = self._dec.decode(batch)  # [n, take*2048, 2] int16
            for i in range(self.n):
                for j in range(take):
                    self._cb(i, make(
                        EventType.AUDIO, program=self._program,
                        samples=pcm[i, j * 2048:(j + 1) * 2048]
                        .reshape(-1)))

    def flush(self):
        """Decode whatever is queued (stations short of the common depth
        are padded with silence packets; their padding output is
        dropped)."""
        depth = max((len(q) for q in self._queues), default=0)
        if depth == 0:
            return
        lens = [len(q) for q in self._queues]
        for i in range(self.n):
            self._queues[i] += [self._silence] * (depth - lens[i])
        batch = [self._queues[i][:depth] for i in range(self.n)]
        self._queues = [[] for _ in range(self.n)]
        pcm = self._dec.decode(batch)
        for i in range(self.n):
            for j in range(lens[i]):
                self._cb(i, make(
                    EventType.AUDIO, program=self._program,
                    samples=pcm[i, j * 2048:(j + 1) * 2048].reshape(-1)))
