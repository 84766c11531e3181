"""Multi-station serving: decode S stations on one accelerator chip.

The reference runs one session per station (src/nrsc5.c:325-358 — one
`nrsc5_t` per dongle); this module is the TPU-native serving surface the
headline benchmark measures, packaged as an API: per-station complex
baseband streams in, per-station transport events out, with ONE fused
batched device dispatch decoding `frames_per_dispatch` P1 frames for all
stations at once (`pipeline.scan_chain_rc.fm_chain_batch_rc` — the P1
FEC flat-batched across stations × frames) and the host transport
(frame/RS/CRC/elastic/HDC/SIS/ID3/AAS) running per station on retire.

Dispatch pipelining: the carried chain state stays ON DEVICE between
dispatches (only the tiny per-station consumed-samples vector is
fetched to advance the host rings), and up to ``depth`` dispatches'
decoded outputs are held in flight before the host transport consumes
them — device execute overlaps host parsing.

Steady-state contract: each station's stream must start at a P1 frame
boundary minus FFTCP//2 samples (block count 0).  For a capture with
unknown timing/CFO, lock first with
:func:`nrsc5_tpu.pipeline.scan_chain_rc.cold_start_rc` and feed
``samples[lock["offset"]:]`` with ``psmi=lock["psmi"]`` — the same
cold-start flow the bench's coldstart row gates.

Measured on the tunneled v5e chip of this environment: decode compute
supports 750-918× real time (bench.py e2e/fm rows, inputs resident on
device), but TRUE streaming — fresh samples uploaded every dispatch —
is input-bound by the tunnel's ~35 MB/s fresh-buffer upload: 16
stations sustain ~4× real time as complex64 and **~11× as cs16**
(``input_format="cs16"``: half the bytes, scaled to float on device).
On hardware with host DMA measured in GB/s the upload ceases to bind;
prefer cs16 ingestion regardless — it is the reference's native wire
format (include/nrsc5.h:54) and quantization sits ~90 dB under signal.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import Event, EventType, make
from nrsc5_tpu.transport import frame as TF
from nrsc5_tpu.transport.output import Output
from nrsc5_tpu.transport.pids import PIDSDecoder


class _StationTransport:
    """The host transport stack of one station (the session's wiring
    minus the device receiver; see api/session.py _wire)."""

    def __init__(self, station: int, callback, hdc_factory=None,
                 mode_fm: bool = True):
        self.station = station
        self._cb = callback
        self.output = Output(self._emit, mode_fm=mode_fm,
                             hdc_decoder_factory=hdc_factory)
        self.pids = PIDSDecoder(self._emit)
        self.frame = TF.FrameDecoder(
            self.output,
            on_audio_service=lambda info: self._emit(
                make(EventType.AUDIO_SERVICE, **info)))

    def _emit(self, event: Event):
        self._cb(self.station, event)

    def consume_am(self, p1, p3, pids, skip: int):
        """p1 [F, 8, 3750], p3 [F, p3_len], pids [F*8, 80]; ``skip``
        leading frames are diversity-delay warm-up (reference
        am_diversity_wait, src/decode.c:507-554) and carry no payload."""
        n_frames = p1.shape[0]
        for f in range(n_frames):
            if f >= skip:
                for b in range(8):
                    self.frame.push_frame(p1[f, b], TF.P1)
                if p3 is not None:
                    self.frame.push_frame(p3[f], TF.P3)
            for b in range(8):
                blk = f * 8 + b
                if blk < pids.shape[0]:
                    self.pids.frame_push(pids[blk])
                self.output.advance()

    def consume(self, p1, margins, pids, px1=None, px2=None):
        n_frames = p1.shape[0]

        def px_rows(bits, f):
            # spread this dispatch's PX frames across its P1 frames so
            # packets land before the advances that pop them (warm-up
            # skipping can shorten the first consuming dispatch)
            if bits is None or bits.shape[0] == 0:
                return ()
            per = max(1, bits.shape[0] // n_frames)
            if f == n_frames - 1:
                return bits[f * per:]
            return bits[f * per:(f + 1) * per]

        for f in range(n_frames):
            self.frame.push_frame(p1[f], TF.P1)
            for bits, lc in ((px1, TF.P3), (px2, TF.P4)):
                for row in px_rows(bits, f):
                    self.frame.push_frame(row, lc)
            for b in range(C.P1_FM_BLOCKS):
                blk = f * C.P1_FM_BLOCKS + b
                if blk < pids.shape[0]:
                    self.pids.frame_push(pids[blk])
                self.output.advance()


class MultiStationReceiver:
    """Serve ``n_stations`` stations from one chip (``mode="fm"`` or
    ``"am"``).

    callback(station: int, event: Event) receives every transport event
    (HDC, AUDIO, ID3, SIS, LOT, ...) tagged with its station index.

    ``push(station, samples)`` takes complex64 baseband at the internal
    rate (744,187.5 S/s FM / 46,511.7 AM), an rc float32 [..., 2] array
    (already ingest-conjugated for FM), or — with
    ``input_format="cs16"`` — raw interleaved int16 I/Q; a device
    dispatch fires whenever every station has a dispatch's worth of
    samples buffered.  Call :meth:`flush` at end of stream to drain the
    in-flight pipeline.
    """

    def __init__(self, n_stations: int, callback: Callable[[int, Event],
                                                           None],
                 frames_per_dispatch: int = 2, psmi: int = 1,
                 depth: int = 2, hdc_factory=None, first_bc: int = 0,
                 input_format: str = "cf32", mode: str = "fm",
                 ma3: bool = False):
        import jax
        import jax.numpy as jnp

        from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
        from nrsc5_tpu.pipeline import scan_chain_rc as rcc

        assert input_format in ("cf32", "cs16")
        assert mode in ("fm", "am")
        self._jnp, self._rcc = jnp, rcc
        self.mode = mode
        self.n_stations = n_stations
        self.psmi = psmi
        self.depth = max(depth, 1)
        # per-station sample queues as chunk lists (no giant re-concats)
        self._chunks: list[list] = [[] for _ in range(n_stations)]
        self._sizes = [0] * n_stations
        self._cs16 = input_format == "cs16"
        self._dtype = np.int16 if self._cs16 else np.float32
        self._packed = jax.default_backend() != "cpu"
        self._first_bc = first_bc
        self._pending: list = []

        def bcast(tree):
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_stations,) + x.shape),
                tree)

        if mode == "fm":
            self.n_blocks = frames_per_dispatch * C.P1_FM_BLOCKS
            self._needed = rcc.buffer_len(self.n_blocks)
            self._carries = jax.jit(
                lambda: bcast(rcc.chain_rc_init_carry(psmi=psmi)))()
            nb, ps, fb, pk = self.n_blocks, psmi, first_bc, self._packed

            def _chain(s, c):
                if self._cs16:
                    # cs16 wire format (the reference's internal rate):
                    # scale on device — half the host->device transfer
                    s = s.astype(jnp.float32) * (1.0 / 32768.0)
                return rcc.fm_chain_batch_rc(s, c, nb, ps, fb, pk)
        else:
            self.n_frames = frames_per_dispatch
            self._needed = scar.am_buffer_len(self.n_frames)
            self._carries = jax.jit(
                lambda: bcast(scar.am_chain_rc_init_carry()))()
            nf, pk = self.n_frames, self._packed
            # diversity-delay warm-up frames carry no payload
            # (reference: am_diversity_wait, src/decode.c:507-554)
            self._am_skip = 3

            def _chain(s, c):
                if self._cs16:
                    s = s.astype(jnp.float32) * (1.0 / 32768.0)
                return scar.am_chain_batch_rc(s, c, nf, ma3, pk)

        self._step = jax.jit(_chain)
        self.transports = [_StationTransport(i, callback, hdc_factory,
                                             mode_fm=mode == "fm")
                           for i in range(n_stations)]
        # PX warm-up: frames decoded before one full interleaver-IV cycle
        # are garbage (reference `ready` flag, src/decode.c:355-359)
        fl1, fl2 = rcc._px_frame_lens(psmi) if mode == "fm" else (0, 0)
        from nrsc5_tpu.ops import interleavers as IL
        self._px_warmup = {
            "px1": IL.p3_iv_tables(fl1)[2] if fl1 else 0,
            "px2": IL.p3_iv_tables(fl2)[2] if fl2 else 0}
        self._px_seen = {"px1": 0, "px2": 0}

    # ------------------------------------------------------------------
    def push(self, station: int, samples: np.ndarray):
        """Append samples for one station: complex64 baseband, an rc
        [..., 2] array of the configured dtype, or (cs16 format) raw
        interleaved int16 I/Q bytes/arrays."""
        s = np.asarray(samples)
        conj = self.mode == "fm"  # the FM ingest convention negates Q
        if s.dtype.kind == "c":
            # complex64 memory IS [re, im] float32 pairs: conjugate once
            # and reinterpret — one pass instead of a strided stack
            # (measured 10x faster)
            s = s.astype(np.complex64, copy=not conj)
            if conj:
                s = np.conj(s)
            s = s.view(np.float32).reshape(-1, 2)
            if self._cs16:
                s = np.clip(s * 32767.0, -32768, 32767).astype(np.int16)
        elif s.ndim == 1:  # interleaved int16 I/Q
            s = s.reshape(-1, 2).astype(self._dtype)
            if conj:
                q = s[:, 1]
                # negate without the int16 -32768 overflow
                s[:, 1] = np.where(q == -32768, 32767, -q) if self._cs16 \
                    else -q
        s = np.ascontiguousarray(s, self._dtype)
        self._chunks[station].append(s)
        self._sizes[station] += len(s)
        self._pump()

    def flush(self):
        """Drain every in-flight dispatch through the transports, then
        the elastic-buffer tails (end of a finite capture; the session's
        flush does the same, api/session.py)."""
        while self._pending:
            self._consume(self._pending.pop(0))
        for tr in self.transports:
            for _ in range(4):
                tr.output.advance()

    # ------------------------------------------------------------------
    def _fill(self, station: int, out: np.ndarray):
        """Copy the first len(out) queued samples into ``out``."""
        n, pos = len(out), 0
        for chunk in self._chunks[station]:
            take = min(len(chunk), n - pos)
            out[pos:pos + take] = chunk[:take]
            pos += take
            if pos == n:
                return
        raise AssertionError("underflow")

    def _drop(self, station: int, n: int):
        chunks = self._chunks[station]
        while n > 0:
            if len(chunks[0]) <= n:
                n -= len(chunks.pop(0))
            else:
                chunks[0] = chunks[0][n:]
                n = 0
        self._sizes[station] = sum(len(c) for c in chunks)

    def _pump(self):
        jnp = self._jnp
        while min(self._sizes) >= self._needed:
            batch = np.empty((self.n_stations, self._needed, 2),
                             self._dtype)
            for i in range(self.n_stations):
                self._fill(i, batch[i])
            out, carries = self._step(jnp.asarray(batch), self._carries)
            # only the consumed-sample counts come back to the host here;
            # the carried state feeds the next dispatch on-device
            consumed = np.asarray(carries.offset)
            self._carries = carries._replace(
                offset=carries.offset - carries.offset)
            for i in range(self.n_stations):
                self._drop(i, int(consumed[i]))
            self._pending.append(out)
            if len(self._pending) > self.depth:
                self._consume(self._pending.pop(0))

    def _consume(self, out):
        from nrsc5_tpu.ops.bits import unpack_out
        out = {k: np.asarray(v) if not isinstance(v, dict) else v
               for k, v in out.items()}
        if self._packed:
            unpack_out(out)
        if self.mode == "am":
            skip = min(self._am_skip, self.n_frames)
            self._am_skip -= skip
            p1 = out["p1"].reshape(self.n_stations, self.n_frames, 8,
                                   C.P1_FRAME_LEN_AM)
            for i, tr in enumerate(self.transports):
                tr.consume_am(p1[i], out["p3"][i], out["pids"][i], skip)
            return
        for key in ("px1", "px2"):
            if key in out:
                self._px_seen[key] += out[key].shape[1]
        for i, tr in enumerate(self.transports):
            px = {}
            for key in ("px1", "px2"):
                if key not in out:
                    px[key] = None
                    continue
                bits = out[key][i]
                # drop warm-up frames from before a full IV cycle
                done_before = self._px_seen[key] - bits.shape[0]
                skip = max(0, self._px_warmup[key] - done_before)
                px[key] = bits[skip:] if skip < bits.shape[0] else None
            tr.consume(out["p1"][i], out["p1_margin"][i], out["pids"][i],
                       px["px1"], px["px2"])
