"""Fuzz the native PNG decoder against corrupt/hostile files.

The decoder (native/loader.cpp) is C++ behind a C ABI fed by dataset
files; the reference leans on libpng via OpenCV for this robustness. Our
from-scratch decoder must turn EVERY malformed input into a clean error
return — never a crash, hang, or unbounded allocation (an exception
crossing the ctypes boundary is std::terminate).

The corpus runs inside a SUBPROCESS with an address-space rlimit: a
decoder that segfaults, aborts, or tries to honor a crafted 2^30 x 2^30
IHDR kills the child, not the test session — and the parent asserts the
child's completion sentinel.
"""

import os
import struct
import subprocess
import sys
import zlib

import numpy as np
import pytest

from dvo_slam_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png(width, height, bit_depth=8, color_type=0, interlace=0,
         rows=None, filters=None):
    """Minimal PNG writer (pure Python — the generator must not share code
    with the C++ decoder under test)."""
    channels = {0: 1, 2: 3, 6: 4}.get(color_type, 1)
    bpp = max(1, channels * bit_depth // 8)
    stride = width * bpp
    raw = bytearray()
    for y in range(height):
        raw.append(0 if filters is None else filters[y % len(filters)])
        if rows is None:
            raw.extend(bytes((x * 7 + y * 13) % 256 for x in range(stride)))
        else:
            raw.extend(rows[y])
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


_CHILD = r"""
import ctypes, resource, struct, sys, zlib

# 2 GB address-space cap: a decoder that believes a hostile IHDR and
# allocates dies here (bad_alloc) instead of OOMing the machine; the
# hardened decoder must survive that as an error return.
resource.setrlimit(resource.RLIMIT_AS, (2 << 30, 2 << 30))

lib = ctypes.CDLL(sys.argv[1])
lib.dvo_decode_intensity.restype = ctypes.c_int
lib.dvo_decode_intensity.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
    ctypes.c_int, ctypes.c_int,
]
lib.dvo_decode_depth.restype = ctypes.c_int
lib.dvo_decode_depth.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
    ctypes.c_int, ctypes.c_int, ctypes.c_float,
]
lib.dvo_png_size.restype = ctypes.c_int
lib.dvo_png_size.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int),
]

corpus_dir = sys.argv[2]
import os
buf = (ctypes.c_float * (64 * 48))()
w = ctypes.c_int(); h = ctypes.c_int()
n_err = n_ok = 0
for name in sorted(os.listdir(corpus_dir)):
    p = os.path.join(corpus_dir, name).encode()
    for call in range(3):
        if call == 0:
            ret = lib.dvo_decode_intensity(p, buf, 64, 48)
        elif call == 1:
            ret = lib.dvo_decode_depth(p, buf, 64, 48, 5000.0)
        else:
            ret = lib.dvo_png_size(p, ctypes.byref(w), ctypes.byref(h))
        if ret == 0:
            n_ok += 1
        else:
            n_err += 1
print(f"FUZZ_DONE ok={n_ok} err={n_err}")
"""


def _mutations(rng):
    """Yield (name, bytes) hostile inputs."""
    base8 = _png(64, 48)  # valid 8-bit gray
    rows16 = [bytes((x * 3 + y) % 256 for x in range(128)) for y in range(48)]
    base16 = _png(64, 48, bit_depth=16, rows=rows16)

    yield "valid8", base8
    yield "valid16", base16
    # Truncations at every region boundary and random offsets.
    for cut in [0, 4, 8, 12, 20, 33, len(base8) // 2, len(base8) - 1]:
        yield f"trunc{cut}", base8[:cut]
    for _ in range(40):
        cut = int(rng.integers(1, len(base16)))
        yield f"trunc16_{cut}", base16[:cut]
    # Random byte flips (headers, chunk lengths, compressed stream).
    for i in range(80):
        b = bytearray(base8 if i % 2 else base16)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        yield f"flip{i}", bytes(b)
    # Hostile IHDR dimensions: giant, negative-as-signed, zero.
    for name, w_, h_ in [
        ("giant", 1 << 30, 1 << 30),
        ("gianthalf", 1 << 30, 48),
        ("neg", 0xFFFFFFF0, 48),
        ("zero", 0, 0),
        ("zerow", 0, 48),
        ("maxcap", (1 << 15), (1 << 15)),  # in-cap dims, huge raw size
    ]:
        ihdr = struct.pack(">IIBBBBB", w_, h_, 8, 0, 0, 0, 0)
        yield f"dims_{name}", (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                               + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
                               + _chunk(b"IEND", b""))
    # Interlaced / odd color types / odd bit depths.
    yield "interlaced", _png(64, 48, interlace=1)
    yield "palette", _png(64, 48, color_type=3)
    yield "depth1", _png(64, 48, bit_depth=1)
    # Bad filter bytes (valid zlib stream, invalid filter ids).
    yield "badfilter", _png(64, 48, filters=[7])
    # Chunk-length lies: IDAT length field larger than the file.
    b = bytearray(base8)
    b[33:37] = struct.pack(">I", 1 << 30)  # first chunk after IHDR... IDAT len
    yield "lyinglen", bytes(b)
    # IDAT that inflates to less than a full image.
    yield "shortidat", (b"\x89PNG\r\n\x1a\n"
                        + _chunk(b"IHDR",
                                 struct.pack(">IIBBBBB", 64, 48, 8, 0, 0, 0, 0))
                        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                        + _chunk(b"IEND", b""))
    # IDAT that inflates to MORE than a full image (zip-bomb-lite).
    yield "longidat", (b"\x89PNG\r\n\x1a\n"
                       + _chunk(b"IHDR",
                                struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
                       + _chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
                       + _chunk(b"IEND", b""))
    # No IHDR at all; IEND first; duplicate IHDR disagreeing on size.
    yield "noihdr", (b"\x89PNG\r\n\x1a\n"
                     + _chunk(b"IDAT", zlib.compress(b"\x00" * 64)))
    yield "iendfirst", b"\x89PNG\r\n\x1a\n" + _chunk(b"IEND", b"")
    yield "garbage", bytes(rng.integers(0, 256, 512, np.uint8))
    yield "empty", b""


def test_decoder_survives_hostile_corpus(tmp_path):
    rng = np.random.default_rng(1234)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    n = 0
    for name, data in _mutations(rng):
        (corpus / f"{n:04d}_{name}.png").write_bytes(data)
        n += 1
    assert n > 130

    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    proc = subprocess.run(
        [sys.executable, str(child), native._LIB_PATH, str(corpus)],
        capture_output=True, text=True, timeout=300,
    )
    # The child prints the sentinel only after EVERY corpus file went
    # through all three entry points; a segfault/terminate/OOM loses it.
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-2000:])
    assert "FUZZ_DONE" in proc.stdout, proc.stderr[-2000:]
    # The two valid files must decode (3 calls each pass for valid8:
    # intensity+size; depth rejects 8-bit — at least 4 total successes).
    ok = int(proc.stdout.split("ok=")[1].split()[0])
    assert ok >= 4


def test_valid_pngs_still_decode(tmp_path):
    """The hardening must not reject real frames (regression guard)."""
    rows = [bytes((x + y) % 256 for x in range(64)) for y in range(48)]
    p8 = tmp_path / "g.png"
    p8.write_bytes(_png(64, 48, rows=rows))
    img = native.decode_intensity(str(p8), 64, 48)
    expect = np.array([[(x + y) % 256 for x in range(64)]
                       for y in range(48)], np.float32)
    np.testing.assert_allclose(img, expect)

    rows16 = []
    vals = np.arange(64 * 48, dtype=np.uint16).reshape(48, 64) % 20000
    for y in range(48):
        rows16.append(vals[y].astype(">u2").tobytes())
    p16 = tmp_path / "d.png"
    p16.write_bytes(_png(64, 48, bit_depth=16, rows=rows16))
    z = native.decode_depth(str(p16), 64, 48, 5000.0)
    good = vals > 0
    np.testing.assert_allclose(z[good], vals[good] / 5000.0, rtol=1e-6)
    assert np.isnan(z[~good]).all()
