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

Stream contract: each station's stream must start at an L1 block
boundary minus FFTCP//2 samples.  Streams starting at block count 0
(a P1 frame boundary) need nothing else; for a capture with unknown
timing/CFO, lock first with
:func:`nrsc5_tpu.pipeline.scan_chain_rc.cold_start_rc`, pass the lock
dicts as ``locks=`` (seeding the carried CFO/phase state and the
per-station ``first_bc`` alignment), and feed
``samples[lock["offset"]:]`` — the same cold-start flow the bench's
coldstart row gates.

Measured on the tunneled v5e chip of this environment: decode compute
supports 1100-2100× real time (bench.py e2e/fm rows round 5, inputs
resident on device), but TRUE streaming — fresh samples uploaded every
dispatch — is input-bound by the tunnel's ~35 MB/s fresh-buffer upload:
16 stations sustain ~4× real time as complex64 and **~11× as cs16**
(``input_format="cs16"``: half the bytes, scaled to float on device).
On hardware with host DMA measured in GB/s the upload ceases to bind;
prefer cs16 ingestion regardless — it is the reference's internal wire
format (include/nrsc5.h:54) and quantization sits ~90 dB under signal.
``input_format="cu8"`` ingests the reference's native 1.488 MS/s
device format (include/nrsc5.h:53 — what rtl_tcp delivers) at the same
bytes/s as cs16, running the ÷2/÷32 halfband cascade on device:
measured 13.6× real time for 16 true-streaming stations on the
tunneled chip (``bench.py --mode serve``, upload-bound at ~40 MB/s).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import Event, EventType, make
from nrsc5_tpu.transport import frame as TF
from nrsc5_tpu.transport.output import Output
from nrsc5_tpu.transport.pids import PIDSDecoder


def _wire_convert(samples, leftover: bytes, cu8: bool, cs16: bool,
                  dtype, conj: bool):
    """Normalize one push's payload to a fresh rc ``[n, 2]`` array at
    the wire dtype (the format contract documented on
    :meth:`MultiStationReceiver.push`): raw bytes (partial trailing I/Q
    pairs carried via ``leftover``), complex64, a 1-D interleaved wire
    array, or an rc ``[..., 2]`` array.  Returns ``(array | None,
    leftover)``; shared by the homogeneous receiver and the
    mode-discovery staging queue (:class:`HeterogeneousReceiver`)."""
    if isinstance(samples, (bytes, bytearray, memoryview)):
        buf = leftover + bytes(samples)
        # bytes per I/Q pair on the wire
        pair = 2 if cu8 else 4 if cs16 else 8
        n = len(buf) - (len(buf) % pair)
        leftover = buf[n:]
        if n == 0:
            return None, leftover
        samples = np.frombuffer(
            buf[:n], np.uint8 if cu8 else
            np.int16 if cs16 else np.complex64)
    s = np.asarray(samples)
    if s.dtype.kind == "c":
        if cu8:
            # quantize to the cu8 wire scale (tx.channel.to_cu8);
            # conjugation happens on device in the ingest stage
            s = s.astype(np.complex64, copy=False) \
                .view(np.float32).reshape(-1, 2)
            s = np.clip(np.round(s * 128.0 + 127.0),
                        0, 255).astype(np.uint8)
        else:
            # complex64 memory IS [re, im] float32 pairs: conjugate
            # once and reinterpret — one pass instead of a strided
            # stack (measured 10x faster).  Both branches materialize
            # a fresh array: the queued chunk must never alias the
            # caller's (reusable) read buffer.
            if conj:
                s = np.conj(s.astype(np.complex64, copy=False))
            else:
                s = s.astype(np.complex64, copy=True)
            s = s.view(np.float32).reshape(-1, 2)
            if cs16:
                s = np.clip(s * 32767.0, -32768,
                            32767).astype(np.int16)
    elif s.ndim == 1:  # interleaved I/Q at the wire dtype
        if cu8:
            s = s.reshape(-1, 2).astype(np.uint8)  # conj on device
        elif s.dtype == np.int16 and not cs16:
            # int16 wire samples into a float chain: restore unit scale
            s = s.reshape(-1, 2).astype(np.float32) * (1.0 / 32768.0)
            if conj:
                s[:, 1] = -s[:, 1]
        else:
            s = s.reshape(-1, 2).astype(dtype)  # fresh copy
            if conj:
                q = s[:, 1]
                # negate without the int16 -32768 overflow
                s[:, 1] = np.where(q == -32768, 32767, -q) \
                    if cs16 else -q
    else:
        # rc [..., 2]: snapshot — callers may reuse their read buffer
        # while this chunk is still queued for a future dispatch
        s = np.array(s, dtype=dtype)
    s = np.ascontiguousarray(s, dtype)
    assert s.ndim == 2 and s.shape[1] == 2, s.shape
    return s, leftover


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
        self._mer_acc = [0.0, 0.0]
        self._mer_cnt = 0

    def _emit(self, event: Event):
        self._cb(self.station, event)

    def mer_push(self, error_lb, error_ub, psmi: int):
        """Per-block sideband error powers -> MER event every 16 blocks,
        same aggregation as the session path (reference src/sync.c:486-501)."""
        for elb, eub in zip(np.atleast_1d(error_lb), np.atleast_1d(error_ub)):
            self._mer_acc[0] += float(elb)
            self._mer_acc[1] += float(eub)
            self._mer_cnt += 1
            if self._mer_cnt == 16:
                ppb = C.partitions_per_band(psmi)
                signal = 2 * C.BLKSZ * ppb * C.PARTITION_DATA_CARRIERS * 16
                self._emit(make(
                    EventType.MER,
                    lower=10 * np.log10(signal / self._mer_acc[0])
                    if self._mer_acc[0] > 0 else 0.0,
                    upper=10 * np.log10(signal / self._mer_acc[1])
                    if self._mer_acc[1] > 0 else 0.0))
                self._mer_acc = [0.0, 0.0]
                self._mer_cnt = 0

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

    def consume(self, p1, bit_errors, pids, px1=None, px2=None):
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
            # channel BER from the device re-encode comparison, the same
            # source as the session path (reference src/decode.c:234-277)
            self._emit(make(EventType.BER, cber=float(bit_errors[f])
                            / C.P1_FRAME_LEN_ENCODED_FM))
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
    (already ingest-conjugated for FM), raw ``bytes``/``bytearray``
    (partial trailing pairs are carried to the next push), or a 1-D
    interleaved array at the wire dtype; a device dispatch fires
    whenever every station has a dispatch's worth of samples buffered.
    ``input_format`` selects the wire: ``"cf32"`` (complex64 at the
    internal rate), ``"cs16"`` (interleaved int16 I/Q at the internal
    rate, scaled to float on device), or ``"cu8"`` — the reference's
    native 1,488,375 S/s unsigned-8 format (nrsc5.h:53, what rtl_tcp
    delivers), with the ÷2 FM / ÷32 AM halfband cascade running on
    device inside the dispatch.  Call :meth:`flush` at end of stream to
    drain the in-flight pipeline.

    The serving chain is the steady-state (FINE-only) fast path, so a
    hole in a station's sample stream breaks its lock.  With
    ``relock=True`` (default) a per-station link watchdog detects the
    dead carrier, emits LOST_SYNC, and re-acquires that station via
    cold start on its queued samples (SYNC on success) while the other
    stations keep decoding — the serving analog of the session's
    NONE→COARSE→FINE machine (reference src/input.c:172-188).  FM keys
    on channel BER > 15% or a vanished K=7 Viterbi margin for 2
    consecutive frames (the session path's thresholds); AM keys on the
    per-frame P3 K=9 margin (2 on a clean carrier, 0 on gap/noise),
    with per-station diversity warm-up suppression so the 3 unprimed
    frames after a (re)lock cannot re-trip it.  In extended FM service
    modes the relocked station's PX frames are garbage for one
    interleaver cycle (CRC-flagged); a relocked AM station re-arms its
    3-frame diversity warm-up (reference am_diversity_wait,
    src/decode.c:507-554).

    Cold start: for captures with unknown timing/CFO, lock each station
    with :func:`nrsc5_tpu.pipeline.scan_chain_rc.cold_start_rc` (FM) or
    :func:`nrsc5_tpu.pipeline.scan_chain_am_rc.cold_start_am_rc` (AM)
    and pass the lock dicts via ``locks=`` (one per station, or one
    shared); then feed ``samples[lock["offset"]:]``.  The locked carry
    (integer/fractional CFO) seeds the chain.  FM: each station's
    ``first_bc`` is consumed by a one-time per-station alignment
    dispatch that decodes PIDS over the partial leading frame, after
    which every steady-state dispatch is frame-aligned; all locks must
    agree on ``psmi`` (one fused program serves the batch).  AM: locks
    are frame-aligned by construction (the bc-history lock fires at
    block count 0) and must agree on MA1-vs-MA3.  Alternatively pass
    ``cold_start=True`` to acquire those locks from the pushed stream
    itself (the live-tuner mode: one SYNC event on acquisition, no
    pre-lock garbage decode).
    """

    def __init__(self, n_stations: int, callback: Callable[[int, Event],
                                                           None],
                 frames_per_dispatch: int = 2, psmi: int = 1,
                 depth: int = 2, hdc_factory=None, first_bc: int = 0,
                 input_format: str = "cf32", mode: str = "fm",
                 ma3: bool = False, locks=None,
                 packed: bool | None = None, relock: bool = True,
                 cold_start: bool = False, mesh=None):
        import jax
        import jax.numpy as jnp

        from nrsc5_tpu.ops import frontend as FE
        from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
        from nrsc5_tpu.pipeline import scan_chain_rc as rcc

        assert input_format in ("cf32", "cs16", "cu8")
        assert mode in ("fm", "am")
        self._jnp, self._jax, self._rcc = jnp, jax, rcc
        self.mode = mode
        self.n_stations = n_stations
        self.depth = max(depth, 1)
        self._cs16 = input_format == "cs16"
        self._cu8 = input_format == "cu8"
        self._dtype = np.int16 if self._cs16 \
            else np.uint8 if self._cu8 else np.float32
        # cu8 is the reference's 1.488 MS/s wire format (nrsc5.h:53): the
        # ÷2 (FM) / ÷32 (AM) halfband cascade runs ON DEVICE inside the
        # dispatch (reference analog: src/input.c:52-90).  The queue then
        # holds raw-rate samples: `_rate` raw per chain sample, plus a
        # carried `_overlap` history window so the stateless cascade has
        # zero net group delay (ops/frontend.rc_overlap).
        stages = (1 if mode == "fm" else FE.AM_STAGES) if self._cu8 else 0
        self._rate = 1 << stages
        self._overlap = FE.rc_overlap(stages)
        # per-station sample queues as chunk lists (no giant re-concats)
        self._chunks: list[list] = [
            [np.full((self._overlap // 2, 2), 127, np.uint8)]
            if self._cu8 else [] for _ in range(n_stations)]
        self._sizes = [self._overlap // 2 if self._cu8 else 0
                       ] * n_stations
        self._leftover = [b""] * n_stations  # partial I/Q pair byte tails

        def ingest(s):
            """Device-side wire→chain-input conversion (shared by the
            steady batch dispatch and the alignment dispatch)."""
            if self._cs16:
                # half the host->device transfer; scale on device
                return s.astype(jnp.float32) * (1.0 / 32768.0)
            if self._cu8:
                f = (s.astype(jnp.float32) - 127.0) * (64.0 / 32767.0)
                if mode == "fm":
                    # the FM ingest convention negates Q (spectral flip)
                    f = f * jnp.asarray(np.array([1.0, -1.0], np.float32))
                    return FE.decimate_overlap_rc(f, 1)
                # reference scales AM input by 1/16 before the cascade
                # (src/input.c:62-66)
                return FE.decimate_overlap_rc(f * (1.0 / 16.0),
                                              FE.AM_STAGES)
            return s
        self._ingest = ingest
        # device-side 8x bit packing of decoded frames (ops/bits.py):
        # on by default off-CPU; override for tests / unusual transports
        self._packed = (jax.default_backend() != "cpu") if packed is None \
            else packed
        self._pending: list = []
        # per-station link watchdog -> cold-start re-acquisition
        # (FM: BER + K=7 margin; AM: K=9 margin)
        self._relock = relock
        self._bad_frames = [0] * n_stations
        # ``cold_start=True`` starts every station in the relock state:
        # initial lock (timing + CFO + alignment) is acquired from the
        # pushed stream by the same machinery that handles mid-stream
        # signal loss, instead of decoding pre-lock garbage until the
        # watchdog trips.  This is the natural mode for live tuners
        # (RtlTcpFleet), where the stream can never be pre-aligned; the
        # startup sequence is then one SYNC event, never LOST_SYNC.
        # (Reference analog: every session starts unsynchronized and
        # acquires, src/acquire.c:63-150.)
        assert not (cold_start and locks is not None), \
            "cold_start acquires its own locks"
        self._relocking = [cold_start] * n_stations
        self._pushed = [0] * n_stations  # lifetime samples pushed
        # probe cooldown: pushed-samples watermark before the next
        # cold-start attempt (samples-based, not dispatch-based — other
        # stations' streams ending must not freeze the retry clock)
        self._relock_next = [0] * n_stations
        self._seq = 0  # dispatch sequence number (tags pending outputs)
        # watch only outputs issued at/after this seq — outputs already
        # in the pipeline when a station relocks are pre-lock garbage
        # and must not re-trip its watchdog
        self._watch_after = [0] * n_stations

        init_carries = None
        first_bcs = [first_bc] * n_stations
        if locks is not None:
            if isinstance(locks, dict):
                locks = [locks] * n_stations
            assert len(locks) == n_stations
            if mode == "fm":
                psmis = {int(lk["psmi"]) for lk in locks}
                assert len(psmis) == 1, \
                    f"all stations must share one service mode, got {psmis}"
                psmi = psmis.pop()
                first_bcs = [int(lk["first_bc"]) for lk in locks]
            else:
                # AM locks (cold_start_am_rc) are frame-aligned by
                # construction (the bc-history lock fires at bc=0), so
                # only the carry (CFO/angle) and the mode matter
                ma3s = {bool(lk["ma3"]) for lk in locks}
                assert len(ma3s) == 1, \
                    "all stations must share one AM mode (MA1 vs MA3)"
                ma3 = ma3s.pop()
            init_carries = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[lk["carry"] for lk in locks])
        self.psmi = psmi
        # blocks of the partial leading frame each station must consume
        # (PIDS-only alignment dispatch) before frame-aligned steady state
        self._align = [(C.P1_FM_BLOCKS - bc) % C.P1_FM_BLOCKS
                       for bc in first_bcs] if mode == "fm" \
            else [0] * n_stations

        def bcast(tree):
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_stations,) + x.shape),
                tree)

        if mode == "fm":
            self.n_blocks = frames_per_dispatch * C.P1_FM_BLOCKS
            self._needed = self._overlap \
                + self._rate * rcc.buffer_len(self.n_blocks)
            self._carries = init_carries if init_carries is not None \
                else jax.jit(
                    lambda: bcast(rcc.chain_rc_init_carry(psmi=psmi)))()
            nb, ps, pk = self.n_blocks, psmi, self._packed

            def _chain(s, c):
                # steady state is always frame-aligned (first_bc handled
                # once per station by the alignment dispatch)
                return rcc.fm_chain_batch_rc(ingest(s), c, nb, ps, 0, pk)
        else:
            self.n_frames = frames_per_dispatch
            self._needed = self._overlap \
                + self._rate * scar.am_buffer_len(self.n_frames)
            self._carries = init_carries if init_carries is not None \
                else jax.jit(
                    lambda: bcast(scar.am_chain_rc_init_carry()))()
            nf, pk = self.n_frames, self._packed
            # diversity-delay warm-up frames carry no payload
            # (reference: am_diversity_wait, src/decode.c:507-554);
            # per-station so a mid-stream relock re-arms only its own
            self._am_skip = [3] * n_stations
            self._scar = scar
            self._ma3 = ma3

            def _chain(s, c):
                return scar.am_chain_batch_rc(ingest(s), c, nf, ma3, pk)

        # multi-chip serving: shard the station batch axis over a
        # jax.sharding.Mesh — every chain op is batchwise over stations
        # (embarrassingly parallel), so XLA partitions the whole
        # dispatch with no collectives; carried state lives sharded on
        # its own device.  One chip serves ~16 stations at real time
        # with ~900x headroom (docs/PERF.md), so this is the scale-out
        # path for fleets past one chip's HBM/dispatch budget.
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            assert n_stations % mesh.size == 0, \
                f"{n_stations} stations over {mesh.size} devices"
            self._shard = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0]))
            self._carries = jax.device_put(self._carries, self._shard)
        self._step = jax.jit(_chain)
        self._cb, self._hdc_factory = callback, hdc_factory
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
    def push(self, station: int, samples):
        """Append samples for one station: complex64 baseband, an rc
        [..., 2] array of the configured dtype, a 1-D interleaved array
        at the wire dtype, or raw bytes at the wire format — complex64
        by default, int16 I/Q pairs with ``input_format="cs16"``,
        unsigned-8 I/Q pairs with ``input_format="cu8"``; trailing
        partial pairs are carried to the next push.  Complex input to a
        cu8 receiver is quantized to the cu8 wire scale."""
        s, self._leftover[station] = _wire_convert(
            samples, self._leftover[station], self._cu8, self._cs16,
            self._dtype, self.mode == "fm")
        if s is None:
            return
        self._chunks[station].append(s)
        self._sizes[station] += len(s)
        self._pushed[station] += len(s)
        self._pump()

    def drain(self):
        """Consume every in-flight dispatch through the transports
        WITHOUT the end-of-stream elastic-tail advances (use
        :meth:`flush` for that) — the pipeline-empty point
        :meth:`checkpoint` needs."""
        while self._pending:
            self._consume(*self._pending.pop(0))

    def flush(self):
        """Drain every in-flight dispatch through the transports, then
        the elastic-buffer tails (end of a finite capture; the session's
        flush does the same, api/session.py)."""
        self.drain()
        for tr in self.transports:
            for _ in range(4):
                tr.output.advance()


    def _pin(self, tree):
        """Re-apply the station mesh sharding after host-side per-station
        carry surgery (no-op without a mesh or when already sharded)."""
        return tree if self._shard is None \
            else self._jax.device_put(tree, self._shard)

    # ------------------------------------------------------------------
    def checkpoint(self) -> dict:
        """Snapshot the receiver's decode state as a numpy pytree
        (``utils.checkpoint.save_state``-compatible): the on-device
        carried chain state, the host sample queues (incl. the cu8
        decimator overlap history and partial byte pairs), and the
        alignment / warm-up counters.  In-flight dispatches are drained
        first.  Host TRANSPORT state (elastic buffers, partial SIS
        messages, LOT fragments) is deliberately not captured — the
        transport layer is self-synchronizing and relocks on the first
        PDU after :meth:`restore`, like the reference recovering from a
        dropped frame.  (The reference has no persistence at all —
        SURVEY §5 checkpoint/resume is a new capability.)"""
        self.drain()
        import jax
        state = {
            "carries": jax.tree.map(np.asarray, self._carries),
            "chunks": [[np.array(c) for c in ch] for ch in self._chunks],
            "leftover": [np.frombuffer(b, np.uint8)
                         for b in self._leftover],
            "align": np.asarray(self._align, np.int64),
            "px_seen": {k: np.asarray(v) for k, v in
                        self._px_seen.items()},
            # watchdog state: a snapshot taken mid-relock must resume
            # re-acquiring, not decode with the stale garbage carry
            "relocking": np.asarray(self._relocking),
            "bad_frames": np.asarray(self._bad_frames, np.int64),
        }
        if self.mode == "am":
            state["am_skip"] = np.asarray(self._am_skip)
        return state

    def restore(self, state: dict):
        """Install a :meth:`checkpoint` snapshot (taken from a receiver
        constructed with the same parameters).  Call before any
        :meth:`push`."""
        jax, jnp = self._jax, self._jnp
        assert not self._pending, "restore() before pushing samples"
        self._carries = self._pin(jax.tree.map(
            lambda x, ref: jnp.asarray(np.asarray(x).astype(ref.dtype)),
            state["carries"], jax.tree.map(np.asarray, self._carries)))
        self._chunks = [[np.array(c) for c in ch]
                        for ch in state["chunks"]]
        self._sizes = [sum(len(c) for c in ch) for ch in self._chunks]
        self._leftover = [bytes(np.asarray(b).tobytes())
                          for b in state["leftover"]]
        self._align = [int(a) for a in np.asarray(state["align"])]
        self._px_seen = {k: int(np.asarray(v))
                         for k, v in state["px_seen"].items()}
        if "relocking" in state:
            self._relocking = [bool(r)
                               for r in np.asarray(state["relocking"])]
            self._bad_frames = [int(b)
                                for b in np.asarray(state["bad_frames"])]
        if self.mode == "am":
            sk = np.atleast_1d(np.asarray(state["am_skip"]))
            if sk.size == 1:  # pre-round-3 scalar snapshots
                sk = np.full(self.n_stations, int(sk[0]))
            self._am_skip = [int(v) for v in sk]

    def save(self, path: str):
        """Persist :meth:`checkpoint` to an ``.npz`` restorable in a
        FRESH process: construct an identically-parameterized receiver
        there and call :meth:`load`.  (The raw checkpoint pytree's
        structure depends on queue contents, so the generic
        ``utils.checkpoint.load_state`` — which needs a structure
        template — cannot restore it cross-process; this flattens the
        queues to one array per station and names every leaf.)"""
        np.savez(path, **self.save_arrays())

    def save_arrays(self) -> dict:
        """:meth:`save`'s flat named-array dict (the ``.npz`` payload) —
        composable by wrappers that persist several receivers into one
        file (:class:`HeterogeneousReceiver`)."""
        st = self.checkpoint()
        jax = self._jax
        out = {}
        for i, leaf in enumerate(jax.tree.flatten(st["carries"])[0]):
            out[f"carry_{i}"] = np.asarray(leaf)
        for i in range(self.n_stations):
            ch = st["chunks"][i]
            out[f"queue_{i}"] = np.concatenate(ch, axis=0) if ch \
                else np.zeros((0, 2), self._dtype)
            out[f"leftover_{i}"] = st["leftover"][i]
        out["align"] = st["align"]
        out["px_seen"] = np.asarray([st["px_seen"]["px1"],
                                     st["px_seen"]["px2"]])
        out["relocking"] = st["relocking"]
        out["bad_frames"] = st["bad_frames"]
        if "am_skip" in st:
            out["am_skip"] = st["am_skip"]
        return out

    def load(self, path: str):
        """Install a :meth:`save` snapshot into this (freshly
        constructed, identically parameterized) receiver."""
        self.load_arrays(np.load(path))

    def load_arrays(self, data):
        """Install a :meth:`save_arrays` dict (or NpzFile view)."""
        jax = self._jax
        leaves, treedef = jax.tree.flatten(self._carries)
        state = {
            "carries": jax.tree.unflatten(
                treedef, [data[f"carry_{i}"]
                          for i in range(len(leaves))]),
            "chunks": [[data[f"queue_{i}"]]
                       for i in range(self.n_stations)],
            "leftover": [data[f"leftover_{i}"]
                         for i in range(self.n_stations)],
            "align": data["align"],
            "px_seen": {"px1": data["px_seen"][0],
                        "px2": data["px_seen"][1]},
            "relocking": data["relocking"],
            "bad_frames": data["bad_frames"],
        }
        if "am_skip" in data:
            state["am_skip"] = data["am_skip"]
        self.restore(state)

    # ------------------------------------------------------------------
    def queue_depth(self, station: int) -> int:
        """Buffered (not yet dispatched) wire samples for one station —
        the fleet-level backpressure/padding signal (RtlTcpFleet)."""
        return self._sizes[station]

    def quiesce(self, station: int):
        """Stop the link watchdog and any relock probing for one station
        whose input is known dead (a lost tuner padded with silence):
        the silence would otherwise trip the BER watchdog and burn a
        futile cold-start probe every dispatch (RtlTcpFleet dead-tuner
        path; reference analog: LOST_DEVICE, src/nrsc5.c:197-201)."""
        self._relocking[station] = False
        self._watch_after[station] = float("inf")

    def _admit(self, k: int, chunks=None, leftovers=None, pushed=None):
        """Grow the fleet by ``k`` stations mid-stream (the
        :class:`HeterogeneousReceiver` auto-discovery path: a station
        whose service mode was just identified joins the fused batch
        program of its mode group).  New stations start in the
        cold-start/relock state — the receiver re-acquires their lock
        from their (transplanted) queues with the same machinery that
        handles mid-stream signal loss — so callers only decide the
        MODE, never alignment.  In-flight dispatches are drained first
        (their outputs are shaped for the old batch); the next dispatch
        retraces the batch program at the new shape (jit caches per
        shape, so shrink/regrow cycles pay nothing new).  Not available
        on a mesh-sharded fleet: the station-axis sharding bakes
        ``n_stations % mesh.size == 0``."""
        assert self._shard is None, "cannot grow a mesh-sharded fleet"
        self.drain()
        jax, jnp = self._jax, self._jnp
        base = self.n_stations
        self.n_stations = base + k
        if self.mode == "fm":
            init_one = lambda: self._rcc.chain_rc_init_carry(  # noqa
                psmi=self.psmi)
        else:
            init_one = lambda: self._scar.am_chain_rc_init_carry()  # noqa
        grown = jax.jit(lambda: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), init_one()))()
        self._carries = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b.astype(a.dtype)], axis=0),
            self._carries, grown)
        for j in range(k):
            ch = [np.asarray(c) for c in chunks[j]] if chunks else (
                [np.full((self._overlap // 2, 2), 127, np.uint8)]
                if self._cu8 else [])
            self._chunks.append(ch)
            self._sizes.append(sum(len(c) for c in ch))
            self._leftover.append(leftovers[j] if leftovers else b"")
            self._pushed.append(int(pushed[j]) if pushed
                                else self._sizes[-1])
            self._relocking.append(True)
            self._bad_frames.append(0)
            self._relock_next.append(0)
            self._watch_after.append(self._seq)
            self._align.append(0)
            self.transports.append(_StationTransport(
                base + j, self._cb, self._hdc_factory,
                mode_fm=self.mode == "fm"))
        if self.mode == "am":
            self._am_skip.extend([3] * k)
        self._pump()

    # ------------------------------------------------------------------
    def _fill_padded(self, station: int, out: np.ndarray):
        """Copy whatever the queue holds (without consuming) and pad
        the tail with neutral samples — input for a station riding the
        batch with a frozen carry (its outputs are discarded)."""
        have = min(self._sizes[station], len(out))
        if have:
            self._fill(station, out[:have])
        out[have:] = 127 if self._cu8 else 0

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
        self._sizes[station] -= n
        while n > 0:
            if len(chunks[0]) <= n:
                n -= len(chunks.pop(0))
            else:
                chunks[0] = chunks[0][n:]
                n = 0

    def _align_station(self, i: int, blocks: int):
        """One-time PIDS-only dispatch over station ``i``'s partial
        leading frame (``first_bc != 0``, e.g. from a cold-start lock):
        advances the carried chain state to the next P1 frame boundary so
        every steady-state dispatch decodes whole frames.  The partial
        frame's PIDS blocks are decoded and consumed here; its P1 soft
        bits are inherently undecodable (a Viterbi frame needs all 16
        blocks — the reference likewise discards pre-lock blocks via its
        bc gate, src/decode.c:389-399)."""
        jax, jnp, rcc = self._jax, self._jnp, self._rcc
        from nrsc5_tpu.ops.bits import unpack_out
        buf = np.empty(
            (self._overlap + self._rate * rcc.buffer_len(blocks), 2),
            self._dtype)
        self._fill(i, buf)
        s = self._ingest(jnp.asarray(buf))
        carry_i = jax.tree.map(lambda x: x[i], self._carries)
        out, carry = rcc.fm_chain_scan_rc(
            s, carry_i, blocks, self.psmi,
            (C.P1_FM_BLOCKS - blocks) % C.P1_FM_BLOCKS,
            self._packed, px=False)
        self._drop(i, self._rate * int(np.asarray(carry.offset)))
        carry = carry._replace(offset=carry.offset - carry.offset)
        self._carries = self._pin(jax.tree.map(
            lambda x, v: x.at[i].set(v), self._carries, carry))
        self._align[i] = 0
        out = {k: np.asarray(v) if not isinstance(v, dict) else v
               for k, v in out.items()}
        if self._packed:
            unpack_out(out)
        tr = self.transports[i]
        for b in range(blocks):
            tr.pids.frame_push(out["pids"][b])
            tr.output.advance()
        tr.mer_push(np.asarray(out["diag"]["error_lb"]),
                    np.asarray(out["diag"]["error_ub"]), self.psmi)

    def _watch(self, i: int, bit_errors, margins):
        """Per-station link-quality watchdog: soft-decision rate-2/5 K=7
        fails far below 15% channel BER, so anything above it is a dead
        carrier (same threshold as the session path's watchdog).  A
        SILENT carrier fools the BER alone (zero LLRs re-encode
        perfectly: cber 0), so a vanished Viterbi metric margin is the
        second trigger (measured: clean signal ~500, zeros/noise 0.0).
        Trips cold-start re-acquisition."""
        if self._relocking[i]:
            return
        for e, m in zip(np.atleast_1d(bit_errors),
                        np.atleast_1d(margins)):
            dead = (float(e) / C.P1_FRAME_LEN_ENCODED_FM > 0.15
                    or float(m) < 1e-3)
            self._bad_frames[i] = self._bad_frames[i] + 1 if dead else 0
        if self._bad_frames[i] >= 2:
            self._bad_frames[i] = 0
            self._relocking[i] = True
            self._relock_next[i] = 0  # probe as soon as samples allow
            self.transports[i]._emit(make(EventType.LOST_SYNC))

    def _watch_am(self, i: int, margins, skip: int):
        """AM link watchdog on the per-frame P3 K=9 Viterbi margin: a
        clean carrier's hard-symbol metrics keep a margin of 2 (one
        parity-flip quantum) through every chunk; gap/noise/silence
        collapse it to 0.  (The P1 margin is useless here: its shorter
        chunked subframes tie to exactly 0 even on clean signal.)
        Reference analog: the bc-history loss of src/sync.c:649-666.
        Diversity warm-up frames after a (re)lock are excluded — their
        delayed bit planes are unprimed even on a clean carrier."""
        if self._relocking[i]:
            return
        for f in range(skip, margins.shape[0]):
            dead = float(margins[f]) < 0.5
            self._bad_frames[i] = self._bad_frames[i] + 1 if dead else 0
        if self._bad_frames[i] >= 2:
            self._bad_frames[i] = 0
            self._relocking[i] = True
            self._relock_next[i] = 0
            self.transports[i]._emit(make(EventType.LOST_SYNC))

    def _try_relock_am(self, i: int):
        """AM cold-start re-acquisition (MA1/MA3) of one station from
        its queued samples.  AM locks are frame-aligned by construction
        (the bc-history lock fires at bc=0) so there is no alignment
        dispatch; the station's diversity warm-up re-arms instead."""
        jax, jnp, scar = self._jax, self._jnp, self._scar
        if self._pushed[i] < self._relock_next[i]:
            return
        need = self._overlap + self._rate * scar.am_buffer_len(3)
        if self._sizes[i] < need:
            return
        buf = np.empty((need, 2), self._dtype)
        self._fill(i, buf)
        rc = self._ingest(jnp.asarray(buf))
        lock = scar.cold_start_am_rc(rc)
        if lock is None or bool(lock["ma3"]) != self._ma3:
            self._relock_next[i] = self._pushed[i] + self._needed
            excess = self._sizes[i] - (self._needed + need)
            excess -= excess % self._rate
            if excess > 0:
                self._drop(i, excess)
            return
        self._carries = self._pin(jax.tree.map(
            lambda x, v: x.at[i].set(v), self._carries, lock["carry"]))
        self._drop(i, self._rate * int(lock["offset"]))
        self._am_skip[i] = 3  # diversity delay re-primes from scratch
        self._relocking[i] = False
        self._watch_after[i] = self._seq
        self.transports[i]._emit(make(EventType.SYNC, psmi=lock["psmi"]))

    def _try_relock(self, i: int):
        """Cold-start re-acquisition of one station from its queued
        samples (serving analog of the session's NONE→COARSE machine).
        On lock: install the locked carry, drop to the locked offset,
        and arm the frame-alignment dispatch.  On no-lock the station
        keeps flowing through the batched dispatches (garbage,
        CRC-flagged) so a never-locking carrier cannot stall the other
        stations or grow any queue; the probe retries at most once per
        dispatch (the stream has advanced a dispatch's worth by then)."""
        jax, jnp, rcc = self._jax, self._jnp, self._rcc
        if self.mode == "am":
            return self._try_relock_am(i)
        if self._pushed[i] < self._relock_next[i]:
            return  # cooldown: wait for fresh stream before re-probing
        need = self._overlap + self._rate * rcc.buffer_len(6)
        if self._sizes[i] < need:
            return  # buffer more samples first
        buf = np.empty((need, 2), self._dtype)
        self._fill(i, buf)
        rc = self._ingest(jnp.asarray(buf))
        lock = rcc.cold_start_rc(rc)
        if lock is None or int(lock["psmi"]) != self.psmi:
            # nothing locked here (mid-gap, silence, or a foreign
            # service mode this batch's fused program cannot serve):
            # retry after a dispatch's worth of fresh samples arrives
            self._relock_next[i] = self._pushed[i] + self._needed
            # hard-bound the queue: a garbage carry's samperr feedback
            # can under-consume, so a never-locking station would
            # otherwise leak memory slowly; its backlog is garbage —
            # keep just a dispatch + a probe window of the freshest tail
            excess = self._sizes[i] - (self._needed + need)
            excess -= excess % self._rate  # keep cu8 pair/phase parity
            if excess > 0:
                self._drop(i, excess)
            return
        self._carries = self._pin(jax.tree.map(
            lambda x, v: x.at[i].set(v), self._carries, lock["carry"]))
        self._drop(i, self._rate * int(lock["offset"]))
        self._align[i] = (C.P1_FM_BLOCKS - int(lock["first_bc"])) \
            % C.P1_FM_BLOCKS
        self._relocking[i] = False
        self._watch_after[i] = self._seq
        self.transports[i]._emit(make(EventType.SYNC, psmi=self.psmi))

    def _pump(self):
        jax, jnp = self._jax, self._jnp
        for i, r in enumerate(self._relocking):
            if r:
                self._try_relock(i)
        for i, a in enumerate(self._align):
            if a and self._sizes[i] >= self._overlap \
                    + self._rate * self._rcc.buffer_len(a):
                self._align_station(i, a)
        while True:
            # a station buffering its one-time alignment dispatch must
            # not pause the fleet (head-of-line stall): it rides the
            # batch with padded samples and a FROZEN carry (the
            # alignment math needs the carry exactly at its lock
            # point), and its outputs are discarded
            waiting = frozenset(i for i, a in enumerate(self._align)
                                if a)
            ready = [self._sizes[i] for i in range(self.n_stations)
                     if i not in waiting]
            if not ready or min(ready) < self._needed:
                break
            batch = np.empty((self.n_stations, self._needed, 2),
                             self._dtype)
            for i in range(self.n_stations):
                if i in waiting:
                    self._fill_padded(i, batch[i])
                else:
                    self._fill(i, batch[i])
            saved = {i: jax.tree.map(lambda x: x[i], self._carries)
                     for i in waiting}
            x = jnp.asarray(batch) if self._shard is None \
                else jax.device_put(batch, self._shard)
            out, carries = self._step(x, self._carries)
            # only the consumed-sample counts come back to the host here;
            # the carried state feeds the next dispatch on-device
            consumed = np.asarray(carries.offset)
            carries = carries._replace(
                offset=carries.offset - carries.offset)
            for i in waiting:
                carries = jax.tree.map(
                    lambda x, v: x.at[i].set(v), carries, saved[i])
            self._carries = carries
            shrank = False
            for i in range(self.n_stations):
                if i in waiting:
                    continue  # queue preserved for the alignment dispatch
                if self.mode == "am" and self._relocking[i]:
                    # AM cold start needs a probe window wider than one
                    # dispatch (the bc-history lock spans up to ~2
                    # frames): keep the queue so it can accumulate —
                    # the station redecodes its (garbage) head
                    # meanwhile, and a failed probe trims the backlog
                    continue
                drop = self._rate * int(consumed[i])
                shrank = shrank or drop > 0
                self._drop(i, drop)
            self._pending.append((self._seq, out, waiting))
            self._seq += 1
            if len(self._pending) > self.depth:
                self._consume(*self._pending.pop(0))
            if not shrank:
                # nothing consumed this iteration (every station either
                # waiting on alignment or an AM station in cold
                # start/relock keeping its queue): one redecode of the
                # stale head per push is enough — without this break an
                # all-relocking AM fleet (cold_start=True, n=1) spins
                # here forever because min(ready) never drops
                break

    def _consume(self, seq, out, skip_stations=frozenset()):
        from nrsc5_tpu.ops.bits import unpack_out
        out = {k: np.asarray(v) if not isinstance(v, dict) else v
               for k, v in out.items()}
        if self._packed:
            unpack_out(out)
        if self.mode == "am":
            p1 = out["p1"].reshape(self.n_stations, self.n_frames, 8,
                                   C.P1_FRAME_LEN_AM)
            margins = np.asarray(out["p3_margin"]).reshape(
                self.n_stations, self.n_frames)
            for i, tr in enumerate(self.transports):
                if i in skip_stations:
                    continue  # rode the batch with a frozen carry
                # outputs issued before a relock are pre-lock garbage
                # (CRC-flagged downstream); they must not consume the
                # diversity warm-up skip armed for the POST-lock frames
                gated = seq >= self._watch_after[i]
                skip = min(self._am_skip[i], self.n_frames) if gated \
                    else self.n_frames
                if gated:
                    self._am_skip[i] -= skip
                tr.consume_am(p1[i], out["p3"][i], out["pids"][i], skip)
                if self._relock and gated:
                    self._watch_am(i, margins[i], skip)
            return
        for key in ("px1", "px2"):
            if key in out:
                self._px_seen[key] += out[key].shape[1]
        elb = np.asarray(out["diag"]["error_lb"])
        eub = np.asarray(out["diag"]["error_ub"])
        for i, tr in enumerate(self.transports):
            if i in skip_stations:
                continue  # rode the batch with a frozen carry
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
            tr.mer_push(elb[i], eub[i], self.psmi)
            tr.consume(out["p1"][i], out["p1_bit_errors"][i],
                       out["pids"][i], px["px1"], px["px2"])
            if self._relock and seq >= self._watch_after[i]:
                self._watch(i, out["p1_bit_errors"][i],
                            out["p1_margin"][i])


class RtlTcpFleet:
    """Serve a fleet of rtl_tcp tuners on one accelerator chip.

    The reference binds one session — one full decode chain — per dongle
    (src/nrsc5.c:331-403); here N tuners share ONE fused batched device
    program: a reader thread per tuner streams the native 1.488 MS/s cu8
    wire format straight into a :class:`MultiStationReceiver`
    (``input_format="cu8"``, decimation on device), and the per-station
    transport events come back tagged with the tuner index.

    ``addrs``: ``[(host, port), ...]`` one rtl_tcp server per station;
    ``frequencies``: Hz per station.  ``gain_db=None`` leaves the
    dongle's hardware AGC on; a dB value selects manual gain (snapped to
    the tuner's gain table, reference src/rtltcp.c:100-154).  Extra
    keyword arguments pass through to the receiver.

    ``modes`` selects the fleet shape: ``None`` (default) — one
    homogeneous :class:`MultiStationReceiver` (every tuner the ``mode``
    / ``psmi`` keywords describe); a per-tuner list like ``["fm", "am",
    "fm"]`` (with ``psmis``/``ma3s`` keywords as needed) — a mixed
    :class:`HeterogeneousReceiver`; or ``"auto"`` — serve-side mode
    DISCOVERY: each tuner's band and service mode are identified from
    its own stream, so the fleet needs no mode arguments at all, like
    the reference's one-session-per-dongle contract (src/nrsc5.c:
    325-358) where a session never declares its mode up front.
    """

    def __init__(self, addrs, frequencies, callback, gain_db=None,
                 stall_timeouts: int = 3, modes=None, **rx_kwargs):
        import threading

        from nrsc5_tpu.io.rtltcp import RtlTcpClient

        assert len(addrs) == len(frequencies)
        self._stall_timeouts = max(int(stall_timeouts), 1)
        rx_kwargs.setdefault("input_format", "cu8")
        assert rx_kwargs["input_format"] == "cu8", \
            "rtl_tcp delivers cu8; other wire formats make no sense here"
        # a live tuner stream can never be pre-aligned: acquire initial
        # lock from the stream (timing + CFO) before decoding anything
        rx_kwargs.setdefault("cold_start", "locks" not in rx_kwargs)
        if modes == "auto":
            assert rx_kwargs["cold_start"], \
                "mode discovery needs cold_start=True (no locks)"
            self.rx = HeterogeneousReceiver(len(addrs), callback,
                                            **rx_kwargs)
        elif modes is not None:
            self.rx = HeterogeneousReceiver(len(addrs), callback,
                                            modes=modes, **rx_kwargs)
        else:
            self.rx = MultiStationReceiver(len(addrs), callback,
                                           **rx_kwargs)
        self.clients = []
        for (host, port), freq in zip(addrs, frequencies):
            c = RtlTcpClient(host, port)
            c.set_sample_rate(int(C.SAMPLE_RATE_CU8))
            if gain_db is None:
                c.set_gain_mode(False)  # dongle hardware AGC
            else:
                c.set_gain(gain_db)
            c.set_frequency(int(freq))
            self.clients.append(c)
        # one receiver, many readers: pushes (and the device dispatches
        # they trigger) serialize on this lock; TCP backpressure holds
        # the tuners off while a dispatch runs
        self._lock = threading.Lock()
        self._stopped = threading.Event()
        self._dead = [False] * len(addrs)
        self._cb = callback
        self._threads = [
            threading.Thread(target=self._reader, args=(i,), daemon=True,
                             name=f"rtltcp-fleet-{i}")
            for i in range(len(addrs))]

    def start(self):
        for t in self._threads:
            t.start()

    def _reader(self, i: int):
        client = self.clients[i]
        stalls = 0
        while not self._stopped.is_set():
            try:
                data = client.read_some(65536)
                stalls = 0
            except TimeoutError:
                # transient stall (server hiccup, network pause): the
                # tuner is not dead — retry.  ``stall_timeouts``
                # consecutive socket timeouts (default 3 ≈ 30 s at the
                # 10 s socket default) count as a broken connection.
                # read_some loses no partial bytes, so retrying
                # preserves cu8 I/Q pair alignment.  Meanwhile pad THIS
                # tuner's queue with silence so the min-queue-gated
                # batched dispatch keeps firing for the live stations
                # (advisor r2): when real samples resume, the inserted
                # silence breaks this station's lock and the relock
                # watchdog re-acquires it.
                stalls += 1
                if stalls < self._stall_timeouts:
                    with self._lock:
                        self._pad_station(i)
                    continue
                self._mark_dead(i)
                break
            except OSError:
                self._mark_dead(i)
                break
            with self._lock:
                self.rx.push(i, data)
                self._pad_dead()

    def _mark_dead(self, i: int):
        """Dead tuner: report it, then keep the fleet running —
        _pad_dead substitutes silence so the batched dispatch (gated on
        min queue depth) never stalls the LIVE stations, and the live
        queues don't grow unboundedly.  (The reference's single-dongle
        analog: LOST_DEVICE + worker stop, src/nrsc5.c:197-201.)"""
        if self._stopped.is_set() or self._dead[i]:
            return
        self._dead[i] = True
        with self._lock:
            # known-dead tuner: the silence padding would otherwise trip
            # the BER watchdog and burn a futile relock probe every
            # dispatch
            self.rx.quiesce(i)
        self._cb(i, make(EventType.LOST_DEVICE))

    def _pad_station(self, k: int):
        """Level one tuner's queue with the deepest live queue (cu8
        silence = 127) so the min-queue-gated dispatch keeps firing.
        Called under the lock."""
        live = [self.rx.queue_depth(j) for j in range(len(self._dead))
                if not self._dead[j] and j != k]
        if not live:
            return
        short = max(live) - self.rx.queue_depth(k)
        if short > 0:
            self.rx.push(k, np.full((short, 2), 127, np.uint8))

    def _pad_dead(self):
        """Keep dead tuners' queues level with the deepest live queue,
        so dispatches keep firing for everyone else.  Called under the
        lock."""
        if not any(self._dead):
            return
        for k, dead in enumerate(self._dead):
            if dead:
                self._pad_station(k)

    def stop(self, flush: bool = True):
        """Disconnect every tuner and (by default) drain the in-flight
        dispatch pipeline through the transports."""
        self._stopped.set()
        for c in self.clients:
            c.close()
        for t in self._threads:
            t.join(timeout=10)
        if flush:
            with self._lock:
                self.rx.flush()


class HeterogeneousReceiver:
    """Serve a fleet whose stations run DIFFERENT service modes — or
    different BANDS — through one surface.

    The fused batch program bakes one L1 geometry (FM psmi / AM
    MA1-vs-MA3) into its shapes, so :class:`MultiStationReceiver`
    requires a homogeneous fleet.  The reference has no batching at all
    — it runs one session per station, each with its own mode
    (src/nrsc5.c:325-358).  This wrapper is the middle ground: stations
    are grouped by ``(band, service mode)`` and each group is served by
    one fused sub-receiver — a fleet mixing MP1, MP3, MP11, MA1, and
    MA3 carriers compiles one program per DISTINCT mode (not per
    station), and every public event keeps its global station index.

    Three ways to declare the fleet:

    * ``psmis=[...]`` / ``ma3s=[...]`` (+ optional per-station
      ``modes=["fm", "am", ...]``; default all ``mode``) — explicit.
    * ``locks=[...]`` — per-station cold-start lock dicts; each lock's
      band is inferred from its fields (AM locks carry ``"ma3"``), so
      a mixed-band fleet needs no other arguments.  A single dict is
      broadcast to every station like :class:`MultiStationReceiver`.
    * NO mode arguments at all, with ``cold_start=True`` and
      ``input_format="cu8"`` — serve-side mode DISCOVERY: each
      station's band and service mode are identified from its pushed
      stream (FM via the cold-start psmi majority vote the session
      path uses, pipeline/receiver.py:173-183 / src/sync.c:366-421;
      AM MA1-vs-MA3 from the cold-start lock probe), and the station
      is assigned to its group on first lock — compiling a new group
      program on first appearance of a mode, growing an existing
      group's batch otherwise.  Discovery needs the rate-unambiguous
      1.488 MS/s cu8 wire (the live-tuner format, nrsc5.h:53): any
      other wire rate already implies the band.  This is the
      reference's contract — a tuner session never declares its mode
      up front — generalized to a batched fleet.

    All remaining keyword arguments are forwarded to every
    sub-receiver.  push/drain/flush/save/load compose over the groups;
    events are bit-exact vs per-mode receivers by construction (the
    groups ARE per-mode receivers — tests/test_serve.py pins it).
    """

    def __init__(self, n_stations: int, callback, psmis=None,
                 ma3s=None, locks=None, mode: str = "fm", modes=None,
                 **kw):
        import jax
        import jax.numpy as jnp

        from nrsc5_tpu.ops import frontend as FE
        from nrsc5_tpu.pipeline import scan_chain_am_rc as scar
        from nrsc5_tpu.pipeline import scan_chain_rc as rcc

        self._jax, self._jnp = jax, jnp
        self._rcc, self._scar, self._FE = rcc, scar, FE
        self.n_stations = n_stations
        self.mode = mode
        self._cb = callback
        self._kw = dict(kw)
        self._groups: list[MultiStationReceiver] = []
        self._remaps: list[list[int]] = []
        self._keys: list[tuple] = []
        self._gindex: dict = {}
        self._slot: list = [None] * n_stations
        self.station_modes: list = [None] * n_stations

        if isinstance(locks, dict):
            # a single lock broadcast to every station, like
            # MultiStationReceiver (a dict used to be silently dropped)
            locks = [locks] * n_stations
        self._auto = (locks is None and psmis is None and ma3s is None
                      and modes is None)
        if self._auto:
            assert kw.get("cold_start"), \
                "without per-station modes, pass cold_start=True to " \
                "discover each station's band/service mode from its stream"
            assert kw.get("input_format") == "cu8", \
                "mode discovery needs the rate-unambiguous cu8 wire " \
                "(cf32/cs16 sample rates already imply the band)"
            # per-station staging queues until each station's mode is
            # discovered; seeded with the (larger) AM decimator-overlap
            # pad of cu8 silence — extra leading DC before an FM signal
            # is transparent to its timing search
            pad = FE.rc_overlap(FE.AM_STAGES) // 2
            self._staging = [[np.full((pad, 2), 127, np.uint8)]
                             for _ in range(n_stations)]
            self._staged = [pad] * n_stations
            self._sleft = [b""] * n_stations
            self._pushed = [0] * n_stations
            self._probe_next = [0.0] * n_stations
            # probe windows: same sizes the in-receiver relock probes use
            self._need_fm = FE.rc_overlap(1) + 2 * rcc.buffer_len(6)
            self._need_am = FE.rc_overlap(FE.AM_STAGES) \
                + (1 << FE.AM_STAGES) * scar.am_buffer_len(3)

            def ingest_fm(b):
                f = (b.astype(jnp.float32) - 127.0) * (64.0 / 32767.0)
                f = f * jnp.asarray(np.array([1.0, -1.0], np.float32))
                return FE.decimate_overlap_rc(f, 1)

            def ingest_am(b):
                f = (b.astype(jnp.float32) - 127.0) * (64.0 / 32767.0)
                return FE.decimate_overlap_rc(f * (1.0 / 16.0),
                                              FE.AM_STAGES)

            self._ingest_fm = jax.jit(ingest_fm)
            self._ingest_am = jax.jit(ingest_am)
            return

        # ---- explicit fleet: derive one (band, mode) key per station
        if locks is not None:
            assert len(locks) == n_stations
            sm = modes or ["am" if "ma3" in lk else "fm" for lk in locks]
            keys = [("am", bool(lk["ma3"])) if m == "am"
                    else ("fm", int(lk["psmi"]))
                    for m, lk in zip(sm, locks)]
        else:
            sm = list(modes) if modes is not None \
                else [mode] * n_stations
            assert len(sm) == n_stations
            keys = []
            for st, m in enumerate(sm):
                assert m in ("fm", "am"), m
                if m == "fm":
                    assert psmis is not None and psmis[st] is not None, \
                        f"station {st} is FM: its psmis entry is required"
                    keys.append(("fm", int(psmis[st])))
                else:
                    keys.append(("am", bool(ma3s[st])
                                 if ma3s is not None else False))
        # stable grouping: stations in ascending order within a group,
        # groups in first-appearance order
        order: dict = {}
        for st, key in enumerate(keys):
            order.setdefault(key, []).append(st)
        for key, members in order.items():
            self._spawn_group(
                key, members,
                locks=[locks[st] for st in members]
                if locks is not None else None)

    # ------------------------------------------------------------------
    def _spawn_group(self, key, members, locks=None):
        """Create the fused sub-receiver for one (band, mode) group and
        register its station remap; returns the receiver."""
        gi = len(self._groups)
        remap = list(members)

        def cb(slot_st, ev, _remap=remap):
            self._cb(_remap[slot_st], ev)

        gkw = dict(self._kw)
        band, param = key
        if locks is not None:
            gkw["locks"] = locks
            gkw.pop("cold_start", None)
        if band == "fm":
            gkw["psmi"] = param
        else:
            gkw["ma3"] = param
        rx = MultiStationReceiver(len(members), cb, mode=band, **gkw)
        self._groups.append(rx)
        self._remaps.append(remap)
        self._keys.append(key)
        self._gindex[key] = gi
        for slot, st in enumerate(members):
            self._slot[st] = (gi, slot)
            self.station_modes[st] = key
        return rx

    # ---- serve-side mode discovery (auto fleets) ---------------------
    def _peek(self, st: int, n: int, tail: bool = False) -> np.ndarray:
        """Copy ``n`` staged samples without consuming: the head window
        (AM probe: needs the accumulated backlog) or the freshest tail
        window (FM probe: must see new data each retry), tail start
        rounded down to a ×32 boundary to keep the decimation-cascade
        phase."""
        start = 0
        if tail:
            start = self._staged[st] - n
            start -= start % 32
        out = np.empty((n, 2), np.uint8)
        filled, pos = 0, 0
        for chunk in self._staging[st]:
            end = pos + len(chunk)
            if end > start:
                lo = max(0, start - pos)
                take = min(len(chunk) - lo, n - filled)
                out[filled:filled + take] = chunk[lo:lo + take]
                filled += take
                if filled == n:
                    return out
            pos = end
        raise AssertionError("staging underflow")

    def _drop_staged(self, st: int, n: int):
        chunks = self._staging[st]
        self._staged[st] -= n
        while n > 0:
            if len(chunks[0]) <= n:
                n -= len(chunks.pop(0))
            else:
                chunks[0] = chunks[0][n:]
                n = 0

    def _try_discover(self, st: int):
        """Identify one undiscovered station's band + service mode from
        its staged stream: FM cold start first (smaller probe window),
        then AM.  On lock the station joins its mode group — the group
        re-acquires the station's alignment itself via its cold-start
        machinery, so only the MODE decision is made here.  Both probes
        failing trims the backlog and arms a cooldown, exactly like the
        in-receiver relock probe on a never-locking carrier."""
        jnp = self._jnp
        if self._pushed[st] < self._probe_next[st]:
            return
        ran = False
        if self._staged[st] >= self._need_fm:
            # freshest tail window: an FM carrier emerging after noise
            # must not hide behind a stale head kept for the AM probe
            lock = self._rcc.cold_start_rc(self._ingest_fm(
                jnp.asarray(self._peek(st, self._need_fm, tail=True))))
            if lock is not None:
                return self._assign(st, ("fm", int(lock["psmi"])))
            ran = True
        if self._staged[st] >= self._need_am:
            lock = self._scar.cold_start_am_rc(self._ingest_am(
                jnp.asarray(self._peek(st, self._need_am))))
            if lock is not None:
                return self._assign(st, ("am", bool(lock["ma3"])))
            # neither band locked on a full backlog: bound it (keep a
            # fresh AM window's worth) before the cooldown retry
            excess = self._staged[st] - (self._need_am + self._need_fm)
            excess -= excess % 32  # keep the ÷32 cascade phase
            if excess > 0:
                self._drop_staged(st, excess)
            ran = True
        if ran:
            self._probe_next[st] = self._pushed[st] + self._need_fm

    def _assign(self, st: int, key):
        """Move a just-discovered station from staging into its (band,
        mode) group, creating the group (new fused program) on first
        appearance of the mode or growing the existing batch
        (:meth:`MultiStationReceiver._admit`)."""
        chunks = self._staging[st]
        left, pushed = self._sleft[st], self._pushed[st]
        self._staging[st] = None
        gi = self._gindex.get(key)
        if gi is None:
            rx = self._spawn_group(key, [st])
            # transplant the staged stream; the cold-started group
            # acquires its own lock from it (one SYNC, no LOST_SYNC)
            rx._chunks[0] = chunks
            rx._sizes[0] = sum(len(c) for c in chunks)
            rx._leftover[0] = left
            rx._pushed[0] = pushed
            rx._pump()
        else:
            rx = self._groups[gi]
            slot = rx.n_stations
            self._remaps[gi].append(st)
            self._slot[st] = (gi, slot)
            self.station_modes[st] = key
            rx._admit(1, chunks=[chunks], leftovers=[left],
                      pushed=[pushed])

    # ------------------------------------------------------------------
    def push(self, station: int, samples):
        if self._slot[station] is None:  # mode not yet discovered
            s, self._sleft[station] = _wire_convert(
                samples, self._sleft[station], True, False, np.uint8,
                False)
            if s is not None:
                self._staging[station].append(s)
                self._staged[station] += len(s)
                self._pushed[station] += len(s)
            return self._try_discover(station)
        gi, slot = self._slot[station]
        self._groups[gi].push(slot, samples)

    def drain(self):
        for g in self._groups:
            g.drain()

    def flush(self):
        for g in self._groups:
            g.flush()

    def queue_depth(self, station: int) -> int:
        """Buffered wire samples for one station (staged samples while
        its mode is still undiscovered) — the fleet-level
        backpressure/padding signal (RtlTcpFleet)."""
        if self._slot[station] is None:
            return self._staged[station]
        gi, slot = self._slot[station]
        return self._groups[gi].queue_depth(slot)

    def quiesce(self, station: int):
        """Stop watching/probing a station whose input is known dead
        (RtlTcpFleet dead-tuner path): an undiscovered station stops
        mode-probing its silence; a grouped one quiesces in its group."""
        if self._slot[station] is None:
            self._probe_next[station] = float("inf")
            return
        gi, slot = self._slot[station]
        self._groups[gi].quiesce(slot)

    @property
    def transports(self):
        """Global-station-ordered view of the per-group transports
        (``None`` for stations whose mode is still undiscovered)."""
        return [None if s is None else self._groups[s[0]].transports[s[1]]
                for s in self._slot]

    # checkpoint / resume: compose the groups (SURVEY §5 A4)
    def checkpoint(self) -> list:
        return [g.checkpoint() for g in self._groups]

    def restore(self, states: list):
        for g, st in zip(self._groups, states):
            g.restore(st)

    def save(self, path: str):
        """One ``.npz`` for the whole mixed fleet (per-group key
        namespaces + a group-composition header + any undiscovered
        stations' staging queues), restorable in a fresh
        identically-parameterized wrapper via :meth:`load` — including
        an auto-discovery wrapper, whose groups are rebuilt from the
        header."""
        out = {}
        meta = []
        for gi, g in enumerate(self._groups):
            for k, v in g.save_arrays().items():
                out[f"g{gi}_{k}"] = v
            band, param = self._keys[gi]
            meta.append([1 if band == "am" else 0, int(param)])
            out[f"g{gi}_members"] = np.asarray(self._remaps[gi],
                                               np.int64)
        out["groups"] = np.asarray(meta, np.int64).reshape(-1, 2)
        if self._auto:
            for st in range(self.n_stations):
                if self._slot[st] is None:
                    ch = self._staging[st]
                    out[f"stage_{st}"] = np.concatenate(ch) if ch \
                        else np.zeros((0, 2), np.uint8)
                    out[f"sleft_{st}"] = np.frombuffer(self._sleft[st],
                                                       np.uint8)
                    out[f"spushed_{st}"] = np.asarray(self._pushed[st])
        np.savez(path, **out)

    def load(self, path: str):
        data = np.load(path)
        if self._auto:
            assert not self._groups, "load() into a FRESH auto wrapper"
            meta = np.asarray(data["groups"]).reshape(-1, 2)
            for gi in range(meta.shape[0]):
                band = "am" if meta[gi, 0] else "fm"
                param = bool(meta[gi, 1]) if band == "am" \
                    else int(meta[gi, 1])
                members = [int(m) for m in data[f"g{gi}_members"]]
                for st in members:
                    self._staging[st] = None
                self._spawn_group((band, param), members)
            for st in range(self.n_stations):
                if f"stage_{st}" in data.files:
                    self._staging[st] = [data[f"stage_{st}"]]
                    self._staged[st] = len(data[f"stage_{st}"])
                    self._sleft[st] = bytes(
                        np.asarray(data[f"sleft_{st}"]).tobytes())
                    self._pushed[st] = int(data[f"spushed_{st}"])
        for gi, g in enumerate(self._groups):
            pre = f"g{gi}_"
            g.load_arrays({k[len(pre):]: data[k]
                           for k in data.files
                           if k.startswith(pre) and k != f"{pre}members"})
