"""nrsc5-tpu: TPU-native NRSC-5 (HD Radio) receive framework.

Public surface:

    from nrsc5_tpu import NRSC5, MODE_FM, MODE_AM, EventType

    radio = NRSC5.open_pipe(callback)
    radio.pipe_samples_cu8(iq_bytes)

Device-side building blocks live in :mod:`nrsc5_tpu.ops`, the fused
high-throughput chains in :mod:`nrsc5_tpu.pipeline`, multi-chip sharding in
:mod:`nrsc5_tpu.parallel`, and the truth-harness transmitter in
:mod:`nrsc5_tpu.tx`.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import nrsc5_tpu.constants` light (no jax import)
    if name in ("NRSC5", "MODE_FM", "MODE_AM"):
        from nrsc5_tpu.api import session
        return getattr(session, name)
    if name in ("Event", "EventType"):
        from nrsc5_tpu.api import events
        return getattr(events, name)
    if name in ("MultiStationReceiver", "RtlTcpFleet"):
        from nrsc5_tpu import serve
        return getattr(serve, name)
    raise AttributeError(name)
