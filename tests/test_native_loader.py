"""Tests for the native C++ image loader (PNG/PGM decode + prefetch)."""

import os
import subprocess

import numpy as np
import pytest

from orb_slam2_annotate_tpu.io import native_loader

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    if not native_loader.available():
        subprocess.run(["bash", os.path.join(REPO, "native", "build.sh")],
                       check=True)
    assert native_loader.available()


def _write_test_images(tmpdir, n=6):
    import cv2

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        img = (rng.rand(120, 160) * 255).astype(np.uint8)
        p = os.path.join(tmpdir, f"f{i}.png")
        cv2.imwrite(p, img)
        paths.append((p, img))
    return paths


def test_decode_png_gray_matches_opencv(tmp_path):
    paths = _write_test_images(str(tmp_path))
    for p, ref in paths[:3]:
        out = native_loader.decode(p)
        np.testing.assert_allclose(out, ref.astype(np.float32), atol=0.5)


def test_decode_png_rgb(tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.png")
    cv2.imwrite(p, img)
    out = native_loader.decode(p)
    # our grayscale: 0.299R + 0.587G + 0.114B; cv2 stores BGR in files ->
    # after imwrite/imread cv2's own gray uses the same weights
    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert out.shape == ref.shape
    assert np.abs(out - ref).mean() < 1.0


def test_decode_png_16bit_depth(tmp_path):
    import cv2

    rng = np.random.RandomState(2)
    depth = (rng.rand(50, 70) * 50000).astype(np.uint16)
    p = str(tmp_path / "depth.png")
    cv2.imwrite(p, depth)
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, depth.astype(np.float32), atol=0.5)


def test_decode_pgm(tmp_path):
    img = (np.random.RandomState(3).rand(40, 50) * 255).astype(np.uint8)
    p = str(tmp_path / "img.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n50 40\n255\n")
        f.write(img.tobytes())
    out = native_loader.decode(p)
    np.testing.assert_allclose(out, img.astype(np.float32), atol=0.5)


def test_prefetch_loader_in_order(tmp_path):
    paths = _write_test_images(str(tmp_path), n=8)
    loader = native_loader.PrefetchLoader([p for p, _ in paths],
                                          n_threads=2, ahead=4)
    assert len(loader) == 8
    for i, (_, ref) in enumerate(paths):
        out = loader[i]
        np.testing.assert_allclose(out, ref.astype(np.float32), atol=0.5)
    loader.close()


def test_decode_error_raises(tmp_path):
    p = str(tmp_path / "garbage.png")
    with open(p, "wb") as f:
        f.write(b"not an image at all")
    with pytest.raises(IOError):
        native_loader.decode(p)
