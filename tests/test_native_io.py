"""Native C++ image codec + prefetch pool vs PIL reference."""

import os

import numpy as np
import pytest

from plslam_tpu.native import imageio


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = (rng.uniform(0, 255, (48, 64))).astype(np.uint8)
        p = str(d / f"{i:04d}.png")
        Image.fromarray(arr, mode="L").save(p)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert imageio._get_lib() is not None, "native lib failed to build"


def test_png_decode_matches_pil(png_files):
    from PIL import Image
    got = imageio.load_gray(png_files[0])
    assert got is not None
    with Image.open(png_files[0]) as im:
        ref = np.asarray(im.convert("L"), dtype=np.float32) / 255.0
    np.testing.assert_allclose(got, ref, atol=1 / 255.0)


def test_pgm_decode(tmp_path):
    arr = np.arange(0, 48, dtype=np.uint8).reshape(6, 8)
    p = str(tmp_path / "x.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n8 6\n255\n")
        f.write(arr.tobytes())
    got = imageio.load_gray(p)
    assert got is not None
    np.testing.assert_allclose(got, arr / 255.0, atol=1e-6)


def test_prefetcher_in_order_and_random(png_files):
    from PIL import Image
    pf = imageio.Prefetcher(png_files, (48, 64), capacity=3, n_threads=2)
    assert pf.native
    try:
        for i in [0, 1, 2, 3, 4, 5]:
            got = pf.get(i)
            with Image.open(png_files[i]) as im:
                ref = np.asarray(im.convert("L"), dtype=np.float32) / 255.0
            np.testing.assert_allclose(got, ref, atol=1 / 255.0)
    finally:
        pf.close()


def test_missing_file_returns_none():
    assert imageio.load_gray("/nonexistent/zzz.png") is None
