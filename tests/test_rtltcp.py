"""rtl_tcp path test: a fake server streams a cu8 capture; the session
worker connects, auto-gains, decodes, and emits events."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from nrsc5_tpu import constants as C
from nrsc5_tpu.api.events import EventType
from nrsc5_tpu.api.session import MODE_FM, NRSC5
from nrsc5_tpu.io.rtltcp import TUNER_R820T


class FakeRtlTcp(threading.Thread):
    """Serves the rtl_tcp handshake and loops a cu8 capture."""

    def __init__(self, capture: bytes):
        super().__init__(daemon=True)
        self.capture = capture
        self.commands = []
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.stop = threading.Event()

    def run(self):
        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", TUNER_R820T, 29))
        conn.setblocking(False)
        pos = 0
        pending = b""
        while not self.stop.is_set():
            try:
                cmd = conn.recv(5)
                if cmd:
                    self.commands.append(struct.unpack(">BI", cmd))
            except BlockingIOError:
                pass
            except OSError:
                break
            if not pending:
                pending = self.capture[pos:pos + 65536]
                if len(pending) < 65536:
                    pending = pending + self.capture[:65536 - len(pending)]
                    pos = (pos + 65536) % len(self.capture)
                else:
                    pos += 65536
            try:
                # non-blocking send: keep the unsent remainder so
                # backpressure never punches holes in the sample stream
                # (sendall on a non-blocking socket can partial-send
                # then raise, silently dropping the rest of the chunk)
                sent = conn.send(pending)
                pending = pending[sent:]
            except BlockingIOError:
                time.sleep(0.01)
            except OSError:
                break
        conn.close()


def _capture(rng) -> bytes:
    from nrsc5_tpu.tx import channel as ch
    from nrsc5_tpu.tx.encoder import build_pm_matrix
    from nrsc5_tpu.tx.modulator import modulate_fm

    pids = np.zeros((16, 80), np.uint8)
    mats = [build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)]
    dummy = build_pm_matrix(
        rng.integers(0, 2, C.P1_FRAME_LEN_FM).astype(np.uint8), pids)
    matrix = np.concatenate([dummy[14 * 32:]] + mats + [dummy[:2 * 32]])
    bc_seq = np.concatenate([np.arange(14, 16), np.arange(16), np.arange(2)])
    sig = modulate_fm(matrix, bc_seq, 1, amplitude=0.15)
    return ch.to_cu8(ch.upsample2(sig)).tobytes()


def test_rtltcp_session(rng):
    server = FakeRtlTcp(_capture(rng))
    server.start()

    events = []
    done = threading.Event()

    def cb(ev):
        events.append(ev)
        if ev.type == EventType.SYNC:
            done.set()

    radio = NRSC5.open_rtltcp("127.0.0.1", server.port, cb, MODE_FM)
    radio.set_frequency(88.5e6)
    radio.start()
    assert done.wait(timeout=120), \
        f"no sync via rtl_tcp; events={set(e.type for e in events)}"
    radio.close()
    server.stop.set()

    ops = [c[0] for c in server.commands]
    assert 0x02 in ops  # sample rate
    assert 0x01 in ops  # frequency
    assert 0x04 in ops  # gain probes from auto-gain
    assert any(e.type == EventType.AGC for e in events)
