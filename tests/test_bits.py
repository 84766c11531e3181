"""Device bit packing (ops/bits.py): roundtrip + numpy equivalence."""

import numpy as np
import pytest

from nrsc5_tpu.ops.bits import pack_bits, pack_out, unpack_bits, unpack_out


@pytest.mark.parametrize("shape", [(146176,), (3, 146176), (2, 5, 80)])
def test_pack_unpack_roundtrip(rng, shape):
    bits = rng.integers(0, 2, shape).astype(np.uint8)
    packed = np.asarray(pack_bits(bits))
    assert packed.shape == shape[:-1] + (shape[-1] // 8,)
    assert np.array_equal(unpack_bits(packed), bits)
    # matches numpy's packbits convention
    assert np.array_equal(packed,
                          np.packbits(bits, axis=-1, bitorder="little"))


def test_pack_out_selective(rng):
    p1 = rng.integers(0, 2, (2, 146176)).astype(np.uint8)
    margin = np.ones(2, np.float32)
    out = {"p1": p1, "p1_margin": margin, "diag": {"x": margin}}
    packed = pack_out(dict(out))
    assert packed["p1"].shape == (2, 146176 // 8)
    assert packed["p1_margin"] is margin
    restored = unpack_out({k: np.asarray(v) if k == "p1" else v
                           for k, v in packed.items()})
    assert np.array_equal(restored["p1"], p1)
