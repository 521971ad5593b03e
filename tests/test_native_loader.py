"""Native C++ PNG decoder / prefetch loader vs the cv2 reference path."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dvo_slam_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (48, 64, 3), np.uint8)
    gray = rng.integers(0, 256, (48, 64), np.uint8)
    depth = rng.integers(0, 20000, (48, 64)).astype(np.uint16)
    depth[0, 0] = 0  # invalid
    cv2.imwrite(os.path.join(d, "rgb.png"), rgb)  # cv2 writes BGR
    cv2.imwrite(os.path.join(d, "gray.png"), gray)
    cv2.imwrite(os.path.join(d, "depth.png"), depth)
    return d, rgb, gray, depth


def test_decode_gray(lib_ok, png_dir):
    d, _, gray, _ = png_dir
    out = native.decode_intensity(os.path.join(d, "gray.png"), 64, 48)
    np.testing.assert_allclose(out, gray.astype(np.float32), atol=0.01)


def test_decode_rgb_to_gray(lib_ok, png_dir):
    d, rgb, _, _ = png_dir
    out = native.decode_intensity(os.path.join(d, "rgb.png"), 64, 48)
    # cv2.imwrite stored BGR; the PNG pixel order is then (B,G,R)? No —
    # cv2.imwrite takes BGR input and writes standard RGB PNGs. So the PNG
    # contains RGB = rgb[..., ::-1]. Our decoder weighs R,G,B.
    r = rgb[..., 2].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 0].astype(np.float32)
    expected = 0.299 * r + 0.587 * g + 0.114 * b
    np.testing.assert_allclose(out, expected, atol=0.51)


def test_decode_depth(lib_ok, png_dir):
    d, _, _, depth = png_dir
    out = native.decode_depth(os.path.join(d, "depth.png"), 64, 48, 5000.0)
    expected = depth.astype(np.float32) / 5000.0
    assert np.isnan(out[0, 0])
    good = depth > 0
    np.testing.assert_allclose(out[good], expected[good], rtol=1e-6)


def test_png_size(lib_ok, png_dir):
    d = png_dir[0]
    assert native.png_size(os.path.join(d, "depth.png")) == (64, 48)


def test_prefetch_loader(lib_ok, png_dir):
    d, _, gray, depth = png_dir
    rgbs = [os.path.join(d, "gray.png")] * 5
    depths = [os.path.join(d, "depth.png")] * 5
    seen = []
    with native.PrefetchLoader(rgbs, depths, 64, 48) as loader:
        for idx, intensity, z in loader:
            seen.append(idx)
            np.testing.assert_allclose(intensity, gray.astype(np.float32), atol=0.01)
            assert np.isnan(z[0, 0])
    assert seen == [0, 1, 2, 3, 4]


def test_loader_skips_bad_file(lib_ok, png_dir, tmp_path):
    d, _, gray, _ = png_dir
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    rgbs = [os.path.join(d, "gray.png"), str(bad), os.path.join(d, "gray.png")]
    depths = [os.path.join(d, "depth.png")] * 3
    seen = []
    with native.PrefetchLoader(rgbs, depths, 64, 48) as loader:
        for idx, intensity, z in loader:
            seen.append(idx)
    assert seen == [0, 2]


def test_png_size_rejects_hostile_header(lib_ok, tmp_path):
    """A corrupt IHDR must surface as IOError (-> the OpenCV fallback in
    utils/tum.load_image_pair), never as a negative-dimension ValueError
    or a multi-GB np.empty in the binding."""
    import struct
    import zlib

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    cases = {
        "neg.png": (0xFFFFFFF0, 48),      # negative as int32
        "giant.png": (1 << 30, 1 << 30),  # multi-GB allocation
        "zero.png": (0, 48),
    }
    for name, (w, h) in cases.items():
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        p = tmp_path / name
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                      + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
                      + chunk(b"IEND", b""))
        with pytest.raises(IOError):
            native.png_size(str(p))
    # Not a PNG at all (bad signature) must also probe as IOError.
    bad = tmp_path / "sig.png"
    bad.write_bytes(b"NOTAPNG!" + b"\x00" * 40)
    with pytest.raises(IOError):
        native.png_size(str(bad))
