"""Fleet audio: batched device PCM for a served multi-station receiver.

The reference decodes audio with one FAAD2 instance per subscribed
program on the host (src/output.c:100-168, MAX_PROGRAMS=8); serving N
stations that way costs N x 3.5 ms/packet of host CPU.
:class:`FleetAudioDecoder` sits on a
:class:`~nrsc5_tpu.serve.MultiStationReceiver`'s event stream, collects
each station's program HDC packets, and decodes them in batches through
:class:`~nrsc5_tpu.audio.batch.BatchedAudioDecoder` — one jitted device
dispatch per fleet batch, performed on a dedicated worker thread so the
device dispatch never blocks the receiver's sample-ingest callback —
emitting AUDIO events tagged with their station and program.

Multi-program: the batch has one lane row per (station, program-slot)
pair.  Subscribe explicitly (``programs=(0, 1)`` — every station
decodes those program numbers) or with ``programs="auto"`` — each
station gets ``max_programs`` slots, assigned to program numbers in
order of first HDC appearance (the reference's analog is the
per-program codec instantiated on first audio, src/output.c:126-163).
Slots not (yet) assigned to a program are non-blocking: they ride each
dispatch as silence lanes and emit nothing.

A (station, program) that stops producing packets (dead carrier,
mid-relock, program signed off) does not stall the fleet: once the
deepest queue is ``max_lag`` packets ahead of the shallowest, lagging
rows are padded with silence packets — each padded slot emits a real
silence AUDIO frame, matching the reference's per-missing-packet
silence insertion (src/output.c:148-162's "not produced" branch) — so
every row's audio timeline stays aligned and no queue grows without
bound.

Usage::

    fleet_audio = FleetAudioDecoder(n_stations, callback, programs=(0, 1))
    rx = MultiStationReceiver(n_stations, fleet_audio.wrap,
                              hdc_factory=None, ...)
    ...push samples...
    rx.flush(); fleet_audio.flush()

``hdc_factory=None`` disables the per-station host codec (HDC packet
events still flow — this class consumes them).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from nrsc5_tpu.api.events import Event, EventType, make


class FleetAudioDecoder:
    """Batch-decode the subscribed programs' HDC streams per station.

    callback(station, event): receives every event forwarded from the
    receiver plus the AUDIO events this class synthesizes (AUDIO events
    arrive from the decode worker thread, tagged ``program``;
    per-(station, program) order is FIFO).  ``k`` packets per row per
    device dispatch (~k * 46.4 ms of audio latency).  Corrupt packets
    decode to silence, matching the reference's gap behavior
    (src/output.c:148-162).  ``max_lag`` bounds how far the deepest
    assigned queue may run ahead of the shallowest before lagging rows
    are silence-padded (their padded slots emit silence AUDIO frames).
    It must exceed one L1 frame's packet count (32): a healthy receiver
    emits each frame's packets station-by-station, so an intra-dispatch
    skew of up to 32 packets is normal and must not trigger padding —
    the default 64 (~3 s of audio) only fires for a genuinely stalled
    row (dead carrier, mid-relock).

    ``programs``: tuple of program numbers every station subscribes to,
    or ``"auto"`` to discover up to ``max_programs`` programs per
    station from the HDC stream itself.  ``program=`` (single int) is
    the backward-compatible spelling of ``programs=(program,)``.
    """

    def __init__(self, n_stations: int, callback, program: int = 0,
                 k: int = 8, backend=None, max_lag: int | None = None,
                 max_pending: int = 256,
                 programs: tuple | str | None = None,
                 max_programs: int = 2):
        from nrsc5_tpu.audio.batch import BatchedAudioDecoder
        self.n = n_stations
        self._cb = callback
        self._auto = programs == "auto"
        if self._auto:
            self.slots = max_programs
        else:
            self._programs = tuple(programs) if programs is not None \
                else (program,)
            self.slots = len(self._programs)
        self.rows = n_stations * self.slots
        self._k = k
        self._max_lag = 64 if max_lag is None else max_lag
        # bounded decode backlog: past this many undecoded batches the
        # newest batch is SHED — emitted as silence frames, in order,
        # without a device dispatch — so a WEDGED device cannot grow
        # memory or latency without bound (real-time overload behaves
        # like the reference's elastic-buffer overflow).  The default
        # is sized to absorb the first dispatch's multi-second XLA
        # compile (a normal backlog that must NOT shed): 256 batches
        # of k=8 ≈ 95 s of audio, ~10 MB of packets at 16 stations.
        self._max_pending = max_pending
        self._dec = BatchedAudioDecoder(self.rows, backend=backend)
        self._queues: list[list[bytes]] = [[] for _ in range(self.rows)]
        # per-row program number; -1 = auto slot not yet assigned.
        # Explicit subscriptions are assigned (and blocking) from the
        # start — the caller asserted those programs exist.
        if self._auto:
            self._row_prog = np.full(self.rows, -1, np.int64)
        else:
            self._row_prog = np.asarray(
                list(self._programs) * n_stations, np.int64)
        # a packet that always parses to silence (empty -> parse error
        # -> corrupt-packet silence lane in the batch decoder)
        self._silence = b""
        self._lock = threading.Lock()
        self._work: queue.Queue = queue.Queue()
        # prepared-batch stage of the 2-thread decode pipeline: the
        # host half (parse + input build, GIL-heavy Python/numpy)
        # overlaps the device half (dispatch + PCM fetch) of the
        # PREVIOUS batch — at fleet scale the host parse alone is
        # ~45 ms per 8-packet batch, which serialized against the
        # dispatch was the serve-audio composed-row wall (round-5
        # ablation, docs/PERF.md).  Bounded so prepare cannot run
        # unboundedly ahead (each prepared item holds ~2 MB of arrays).
        self._disp: queue.Queue = queue.Queue(maxsize=2)
        self._worker: threading.Thread | None = None
        self._dispatcher: threading.Thread | None = None
        self._err: BaseException | None = None

    # ------------------------------------------------------------------
    def _row_of(self, station: int, program: int) -> int | None:
        """Map (station, program) -> batch row, assigning an auto slot
        on first appearance.  Caller holds self._lock."""
        base = station * self.slots
        for s in range(self.slots):
            if self._row_prog[base + s] == program:
                return base + s
        if not self._auto:
            return None
        for s in range(self.slots):
            if self._row_prog[base + s] < 0:
                self._row_prog[base + s] = program
                return base + s
        return None  # station already at max_programs

    def _raise_err(self):
        """Surface (once) an error the worker hit, before any queue
        mutation — so no batch is popped and lost to a stale error."""
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def wrap(self, station: int, event: Event):
        """The receiver callback: intercept HDC, forward everything.
        Only queue bookkeeping happens here — the device dispatch runs
        on the decode worker thread, off the ingest critical path.
        Popping and submitting both happen under the lock, so the
        worker's decode order always equals the pop order (a concurrent
        flush cannot jump ahead of a popped batch)."""
        self._raise_err()
        if event.type == EventType.HDC:
            # transport/output.py always sets `program`; if an emitter
            # omits it, fall back to the first subscribed program (not a
            # fixed 0, which would silently drop every packet for a
            # subscriber on program N in explicit mode)
            default = self._programs[0] if not self._auto else 0
            prog = int(getattr(event, "program", default))
            data = bytes(event.data) if not event.crc_error \
                else self._silence
            with self._lock:
                row = self._row_of(station, prog)
                if row is not None:
                    self._queues[row].append(data)
                    batch = self._take_ready_locked()
                    if batch is not None:
                        self._submit_locked(batch)
        self._cb(station, event)

    # ------------------------------------------------------------------
    def _take_ready_locked(self):
        """If a k-deep batch is ready (padding lagging assigned rows
        once the fleet spread exceeds max_lag; unassigned auto slots
        never block and ride as silence), pop and return it; else None.
        Caller holds self._lock."""
        lens = [len(q) for q in self._queues]
        live = [i for i in range(self.rows) if self._row_prog[i] >= 0]
        if not live:
            return None
        depth = min(lens[i] for i in live)
        k = self._k
        if depth < k and max(lens[i] for i in live) - depth > self._max_lag:
            # a starving row is holding the fleet back: pad it with
            # silence up to a dispatchable depth (real gap -> silence
            # frames, like the reference's "not produced" branch)
            target = min(k, max(lens[i] for i in live))
            for i in live:
                if lens[i] < target:
                    self._queues[i] += \
                        [self._silence] * (target - lens[i])
            depth = target
        if depth < k:
            return None
        take = k
        batch, emit = [], []
        for i in range(self.rows):
            if self._row_prog[i] >= 0:
                batch.append(self._queues[i][:take])
                del self._queues[i][:take]
                emit.append(take)
            else:  # unassigned auto slot: silence lane, no output
                batch.append([self._silence] * take)
                emit.append(0)
        return (batch, emit)

    def _submit_locked(self, item, shed_ok: bool = True):
        """Enqueue a popped batch for the worker.  Caller holds
        self._lock (ordering + quiesced-checkpoint guarantee).  Over
        the pending bound the batch is shed: a marker rides the same
        queue so its silence frames still come out in order."""
        if self._worker is None:
            self._worker = threading.Thread(
                target=self._run, name="fleet-audio-prep", daemon=True)
            self._worker.start()
            self._dispatcher = threading.Thread(
                target=self._run_dispatch, name="fleet-audio-dispatch",
                daemon=True)
            self._dispatcher.start()
        batch, lens = item
        # count BOTH pipeline stages against the bound (the prepare
        # stage and the bounded _disp queue hold a few undecoded
        # batches outside _work)
        if shed_ok and (self._work.qsize() + self._disp.qsize()
                        >= self._max_pending):
            self._work.put((None, (lens, self._row_prog.copy())))
        else:
            self._work.put((batch, (lens, self._row_prog.copy())))

    def _run(self):
        """Prepare stage: parse + device-input build (host half)."""
        while True:
            item = self._work.get()
            try:
                if item is None:
                    self._disp.put(None)
                    return
                batch, meta = item
                prepared = None if batch is None \
                    else self._dec.prepare(batch)
                self._disp.put((prepared, batch is not None, meta))
            except BaseException as e:  # surfaced on the next flush/wrap
                if self._err is None:  # first error wins (root cause)
                    self._err = e
            finally:
                self._work.task_done()

    def _run_dispatch(self):
        """Dispatch stage: device run + PCM fetch + AUDIO emission.
        Runs batches strictly in preparation order (the decoder's
        carried state is sequential)."""
        while True:
            item = self._disp.get()
            try:
                if item is None:
                    return
                prepared, real, (lens, progs) = item
                if not real:  # shed under overload: silence frames
                    z = np.zeros(4096, np.int16)
                    for i in range(self.rows):
                        for _ in range(lens[i]):
                            self._cb(i // self.slots, make(
                                EventType.AUDIO, program=int(progs[i]),
                                samples=z))
                else:
                    self._emit(self._dec.dispatch(prepared), lens, progs)
            except BaseException as e:  # surfaced on the next flush/wrap
                if self._err is None:  # first error wins (root cause)
                    self._err = e
            finally:
                self._disp.task_done()

    def _emit(self, pcm, emit_lens, progs):
        for i in range(self.rows):
            for j in range(emit_lens[i]):
                self._cb(i // self.slots, make(
                    EventType.AUDIO, program=int(progs[i]),
                    samples=pcm[i, j * 2048:(j + 1) * 2048].reshape(-1)))

    def flush(self):
        """Decode whatever is queued (rows short of the common depth
        are padded with silence packets; their padding output is
        dropped) and block until the worker has drained — after flush()
        every queued packet's AUDIO event has been delivered.  The
        final batch is never shed (end-of-stream correctness beats
        overload latency)."""
        with self._lock:
            depth = max((len(q) for q in self._queues), default=0)
            if depth > 0:
                lens = [len(q) for q in self._queues]
                for i in range(self.rows):
                    self._queues[i] += [self._silence] * (depth - lens[i])
                batch = [self._queues[i][:depth] for i in range(self.rows)]
                self._queues = [[] for _ in range(self.rows)]
                self._submit_locked((batch, lens), shed_ok=False)
        if self._worker is not None:
            self._work.join()
            self._disp.join()
        self._raise_err()

    def close(self):
        """Stop the pipeline threads (flush first if output matters)."""
        if self._worker is not None:
            self._work.put(None)
            self._worker.join()
            self._dispatcher.join()
            self._worker = None
            self._dispatcher = None

    # ------------------------------------------------------------------
    # checkpoint / resume (serving analog:
    # serve.MultiStationReceiver.save/load — SURVEY §5 A4)
    # ------------------------------------------------------------------
    def checkpoint(self) -> dict:
        """Drain in-flight decodes, then snapshot the decoder state
        (BatchedAudioDecoder.checkpoint) plus the undecoded per-row
        packet queues and the auto program-slot map as named numpy
        arrays.  Quiesced: submissions happen under self._lock, so once
        the queue is verified empty under the lock no decode can run
        concurrently with the snapshot (a wrap() racing between join()
        and the lock retries the drain)."""
        while True:
            if self._worker is not None:
                self._work.join()
                self._disp.join()
            with self._lock:
                if self._worker is None \
                        or (self._work.unfinished_tasks == 0
                            and self._disp.unfinished_tasks == 0):
                    out = self._dec.checkpoint()
                    out["row_prog"] = self._row_prog.copy()
                    for i, q in enumerate(self._queues):
                        out[f"q_{i}"] = \
                            np.frombuffer(b"".join(q), np.uint8) \
                            if q else np.zeros(0, np.uint8)
                        out[f"qlen_{i}"] = np.asarray(
                            [len(pk) for pk in q], np.int64)
                    return out

    def restore(self, state):
        """Install a :meth:`checkpoint` snapshot (dict or NpzFile) into
        this fresh, identically-parameterized decoder."""
        self._dec.restore(state)
        queues = []
        for i in range(self.rows):
            flat = np.asarray(state[f"q_{i}"], np.uint8).tobytes()
            q, pos = [], 0
            for ln in np.asarray(state[f"qlen_{i}"]):
                q.append(flat[pos:pos + int(ln)])
                pos += int(ln)
            queues.append(q)
        with self._lock:
            self._queues = queues
            if "row_prog" in state:  # absent in pre-multiprogram saves
                self._row_prog = np.asarray(
                    state["row_prog"], np.int64).copy()

    def save(self, path: str):
        """Persist to an ``.npz`` restorable in a fresh process."""
        np.savez(path, **self.checkpoint())

    def load(self, path: str):
        self.restore(np.load(path))
