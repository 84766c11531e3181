"""Extract ISO/IEC 13818-7 / 14496-3 AAC+SBR data tables from the system
libavcodec static library into ``nrsc5_tpu/audio/aac_tables.py``.

The HDC codec (nrsc5_tpu/audio) needs the standard AAC huffman codebooks,
scalefactor-band tables, TNS coefficient maps and the SBR QMF prototype /
huffman / noise tables.  These are *data tables of the ISO specification*
(not code); this environment has no network and no spec text, but the
distro's ``libavcodec.a`` carries them verbatim in ``aactab.o`` /
``aacdec.o`` / ``aacsbr.o``.  This script locates each table by ELF symbol
and emits them as a generated Python module, so the codec itself is fully
self-contained and clean-room.

Run: python support/extract_aac_tables.py
"""

from __future__ import annotations

import base64
import subprocess
import sys
import tempfile
import zlib
from pathlib import Path

LIB = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT = Path(__file__).resolve().parent.parent / "nrsc5_tpu/audio/aac_tables.py"

# (object file, symbol, dtype, shape) — shape -1 = infer from size
WANted = None
TABLES = [
    # --- AAC core (aactab.o): spectral + scalefactor huffman codebooks,
    # scalefactor-band offsets, tns coefficient maps -------------------
    ("aactab.o", "ff_aac_scalefactor_code", "u4", (121,)),
    ("aactab.o", "ff_aac_scalefactor_bits", "u1", (121,)),
    ("aactab.o", "ff_aac_spectral_sizes", "u2", (11,)),
    *[("aactab.o", f"codes{i}", "u2", (-1,)) for i in range(1, 12)],
    *[("aactab.o", f"bits{i}", "u1", (-1,)) for i in range(1, 12)],
    ("aactab.o", "swb_offset_1024_24", "u2", (-1,)),  # 22.05/24 kHz long
    ("aactab.o", "swb_offset_128_24", "u2", (-1,)),   # 22.05/24 kHz short
    ("aactab.o", "swb_offset_1024_48", "u2", (-1,)),  # 44.1/48 kHz long
    ("aactab.o", "swb_offset_128_48", "u2", (-1,)),
    ("aactab.o", "ff_aac_num_swb_1024", "u1", (13,)),
    ("aactab.o", "ff_aac_num_swb_128", "u1", (13,)),
    ("aactab.o", "ff_tns_max_bands_1024", "u1", (13,)),
    ("aactab.o", "ff_tns_max_bands_128", "u1", (13,)),
    ("aacdec.o", "tns_tmp2_map_0_3", "f4", (-1,)),
    ("aacdec.o", "tns_tmp2_map_0_4", "f4", (-1,)),
    ("aacdec.o", "tns_tmp2_map_1_3", "f4", (-1,)),
    ("aacdec.o", "tns_tmp2_map_1_4", "f4", (-1,)),
    # --- SBR (aacsbr.o): QMF prototype filter, huffman tables, noise --
    ("aacsbr.o", "sbr_qmf_window_us", "f4", (640,)),
    ("aacsbr.o", "ff_sbr_noise_table", "f4", (-1, 2)),
    ("aacsbr.o", "sbr_offset", "i1", (6, 16)),
    ("aacsbr.o", "t_huffman_env_1_5dB_codes", "u4", (121,)),
    ("aacsbr.o", "t_huffman_env_1_5dB_bits", "u1", (121,)),
    ("aacsbr.o", "f_huffman_env_1_5dB_codes", "u4", (121,)),
    ("aacsbr.o", "f_huffman_env_1_5dB_bits", "u1", (121,)),
    ("aacsbr.o", "t_huffman_env_bal_1_5dB_codes", "u4", (49,)),
    ("aacsbr.o", "t_huffman_env_bal_1_5dB_bits", "u1", (49,)),
    ("aacsbr.o", "f_huffman_env_bal_1_5dB_codes", "u4", (49,)),
    ("aacsbr.o", "f_huffman_env_bal_1_5dB_bits", "u1", (49,)),
    ("aacsbr.o", "t_huffman_env_3_0dB_codes", "u4", (63,)),
    ("aacsbr.o", "t_huffman_env_3_0dB_bits", "u1", (63,)),
    ("aacsbr.o", "f_huffman_env_3_0dB_codes", "u4", (63,)),
    ("aacsbr.o", "f_huffman_env_3_0dB_bits", "u1", (63,)),
    ("aacsbr.o", "t_huffman_env_bal_3_0dB_codes", "u2", (25,)),
    ("aacsbr.o", "t_huffman_env_bal_3_0dB_bits", "u1", (25,)),
    ("aacsbr.o", "f_huffman_env_bal_3_0dB_codes", "u2", (25,)),
    ("aacsbr.o", "f_huffman_env_bal_3_0dB_bits", "u1", (25,)),
    ("aacsbr.o", "t_huffman_noise_3_0dB_codes", "u2", (63,)),
    ("aacsbr.o", "t_huffman_noise_3_0dB_bits", "u1", (63,)),
    ("aacsbr.o", "t_huffman_noise_bal_3_0dB_codes", "u1", (25,)),
    ("aacsbr.o", "t_huffman_noise_bal_3_0dB_bits", "u1", (25,)),
]

DTYPE_SIZE = {"u1": 1, "i1": 1, "u2": 2, "u4": 4, "f4": 4}


def read_sections(obj: Path) -> dict[int, tuple[int, int]]:
    """section index -> (file offset, size)."""
    out = {}
    txt = subprocess.run(["readelf", "-SW", str(obj)], capture_output=True,
                         text=True, check=True).stdout
    for line in txt.splitlines():
        line = line.strip()
        if not line.startswith("["):
            continue
        body = line[line.index("]") + 1:].split()
        idx = line[1:line.index("]")].strip()
        if not idx.isdigit() or len(body) < 5:
            continue
        # Name Type Address Off Size ...
        out[int(idx)] = (int(body[3], 16), int(body[4], 16))
    return out


def read_symbols(obj: Path) -> dict[str, tuple[int, int, int]]:
    """symbol -> (value, size, section index)."""
    out = {}
    txt = subprocess.run(["readelf", "-sW", str(obj)], capture_output=True,
                         text=True, check=True).stdout
    for line in txt.splitlines():
        parts = line.split()
        if len(parts) < 8 or parts[3] != "OBJECT":
            continue
        try:
            ndx = int(parts[6])
        except ValueError:
            continue
        out[parts[7]] = (int(parts[1], 16), int(parts[2]), ndx)
    return out


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        subprocess.run(["ar", "x", LIB, "aactab.o", "aacdec.o", "aacsbr.o"],
                       cwd=td, check=True)
        blobs = {}
        for obj_name, sym, dt, shape in TABLES:
            obj = Path(td) / obj_name
            secs = read_sections(obj)
            syms = read_symbols(obj)
            if sym not in syms:
                sys.exit(f"symbol {sym} not found in {obj_name}")
            value, size, ndx = syms[sym]
            sec_off, sec_size = secs[ndx]
            assert value + size <= sec_size, sym
            data = obj.read_bytes()[sec_off + value: sec_off + value + size]
            arr = np.frombuffer(data, "<" + dt)
            if -1 not in shape:
                want = 1
                for s in shape:
                    want *= s
                assert arr.size == want, (sym, arr.size, shape)
            arr = arr.reshape(shape)
            blobs[sym] = (dt, arr.shape, data)

    payload = b"".join(data for _, _, data in blobs.values())
    packed = base64.b64encode(zlib.compress(payload, 9)).decode()
    lines = [
        '"""AAC / SBR specification data tables (GENERATED — do not edit).',
        "",
        "Generated by support/extract_aac_tables.py from the system",
        "libavcodec.a (ISO/IEC 13818-7 + 14496-3 data tables carried in",
        "aactab.o / aacdec.o / aacsbr.o).  Spec tables, not code.",
        '"""',
        "",
        "import base64",
        "import zlib",
        "",
        "import numpy as np",
        "",
        "_RAW = zlib.decompress(base64.b64decode(",
    ]
    for i in range(0, len(packed), 72):
        lines.append(f'    "{packed[i:i + 72]}"')
    lines.append("))")
    lines.append("")
    off = 0
    for sym, (dt, shape, data) in blobs.items():
        n = len(data)
        lines.append(
            f"{sym.upper()} = np.frombuffer(_RAW[{off}:{off + n}], "
            f'"<{dt}").reshape({tuple(shape)})')
        off += n
    lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({len(blobs)} tables, {off} bytes raw)")


if __name__ == "__main__":
    main()
