"""Build the reference libnrsc5.so out-of-tree for golden cross-checks.

Compiles /root/reference/src/*.c in place (nothing is copied into this
repo) against the stub fftw3f / librtlsdr implementations in this
directory.  FAAD2 stays disabled, so the reference emits HDC packets but
no PCM — HDC packets are exactly the bit-exact comparison boundary
(SURVEY.md section 4).  Returns the path to the built library, or None
when the reference tree is absent (the cross-check tests skip then).

Reference build recipe: /root/reference/src/CMakeLists.txt:36-70.
"""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = os.environ.get("NRSC5_REFERENCE_DIR", "/root/reference")

LIBRARY_FILES = [
    "acquire.c",
    "decode.c",
    "frame.c",
    "here_images.c",
    "input.c",
    "nrsc5.c",
    "output.c",
    "pids.c",
    "rtltcp.c",
    "sync.c",
    "firdecim_q15.c",
    "conv_dec.c",
    "rs_init.c",
    "rs_decode.c",
    "unicode.c",
    "strndup.c",
]


def build(out_dir: str | None = None) -> str | None:
    src = os.path.join(REFERENCE, "src")
    include = os.path.join(REFERENCE, "include")
    if not os.path.isdir(src) or not os.path.isdir(include):
        return None
    out_dir = out_dir or os.path.join(HERE, "build")
    os.makedirs(out_dir, exist_ok=True)
    lib = os.path.join(out_dir, "libnrsc5.so")
    sources = [os.path.join(src, f) for f in LIBRARY_FILES]
    sources += [os.path.join(HERE, "fftw_shim.c"), os.path.join(HERE, "rtlsdr_shim.c")]
    import glob

    headers = (glob.glob(os.path.join(src, "*.h"))
               + glob.glob(os.path.join(include, "*.h"))
               + [os.path.join(HERE, f)
                  for f in ("fftw3.h", "rtl-sdr.h", "config.h")])
    newest_dep = max(os.path.getmtime(p) for p in sources + headers)
    if os.path.exists(lib) and os.path.getmtime(lib) >= newest_dep:
        return lib
    cmd = [
        "cc",
        "-shared",
        "-fPIC",
        "-O2",
        "--std=gnu11",
        "-D_GNU_SOURCE",
        '-DGIT_COMMIT_HASH="refbuild"',
        "-I",
        HERE,  # config.h + stub fftw3.h / rtl-sdr.h
        "-I",
        include,
        "-o",
        lib,
        *sources,
        "-lm",
        "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=300)
    except subprocess.CalledProcessError as e:
        # surface the compile error: a silently-skipped cross-check would
        # make a broken gate look green
        import sys

        print(f"refbuild: cc failed:\n{e.stderr[-3000:]}", file=sys.stderr)
        return None
    except (subprocess.TimeoutExpired, FileNotFoundError) as e:
        import sys

        print(f"refbuild: {e!r}", file=sys.stderr)
        return None
    return lib


if __name__ == "__main__":
    path = build()
    print(path or "build failed / reference absent")
