"""Native C++ dataset loader (native/dataset_loader.cpp via ctypes):
decode correctness vs PIL ground truth + prefetcher equivalence.

The reference loads frames with OpenCV C++ (Examples/RGB-D/rgbd_tum.cc);
this is the TPU build's native data path. Covers the formats the runners
feed: 8-bit gray/RGB PNG, 16-bit gray PNG (TUM depth), binary PGM/PPM.
"""
import os

import numpy as np
import pytest

from dani_slam_tpu.utils import native

LIB = native.get_lib()


def _write_png(path, arr):
    from PIL import Image
    if arr.dtype == np.uint16:
        Image.fromarray(arr, mode="I;16").save(path)
    else:
        Image.fromarray(arr).save(path)


@pytest.mark.skipif(LIB is None, reason="native loader did not build")
class TestNativeDecode:
    def test_png_gray8(self, tmp_path):
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 256, (48, 64), np.uint8)
        p = str(tmp_path / "g.png")
        _write_png(p, arr)
        out = native.load_image_native(p)
        np.testing.assert_array_equal(out, arr)

    def test_png_rgb8(self, tmp_path):
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 256, (40, 56, 3), np.uint8)
        p = str(tmp_path / "c.png")
        _write_png(p, arr)
        out = native.load_image_native(p)
        np.testing.assert_array_equal(out, arr)

    def test_png_gray16_tum_depth(self, tmp_path):
        rng = np.random.RandomState(2)
        arr = rng.randint(0, 65536, (32, 44), np.uint16)
        p = str(tmp_path / "d.png")
        _write_png(p, arr)
        out = native.load_image_native(p)
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, arr)

    def test_pgm_and_ppm(self, tmp_path):
        rng = np.random.RandomState(3)
        g = rng.randint(0, 256, (20, 30), np.uint8)
        pg = str(tmp_path / "x.pgm")
        with open(pg, "wb") as f:
            f.write(b"P5\n30 20\n255\n" + g.tobytes())
        np.testing.assert_array_equal(native.load_image_native(pg), g)
        c = rng.randint(0, 256, (20, 30, 3), np.uint8)
        pp = str(tmp_path / "x.ppm")
        with open(pp, "wb") as f:
            f.write(b"P6\n30 20\n255\n" + c.tobytes())
        np.testing.assert_array_equal(native.load_image_native(pp), c)

    def test_prefetcher_matches_sync(self, tmp_path):
        rng = np.random.RandomState(4)
        paths = []
        arrs = []
        for i in range(12):
            arr = rng.randint(0, 256, (24, 36), np.uint8)
            p = str(tmp_path / f"f{i}.png")
            _write_png(p, arr)
            paths.append(p)
            arrs.append(arr)
        pf = native.ImagePrefetcher(paths, n_threads=3, window=4)
        try:
            for i, out in enumerate(pf):
                np.testing.assert_array_equal(out, arrs[i])
        finally:
            pf.close()

    def test_io_load_image_uses_native(self, tmp_path):
        from dani_slam_tpu.utils import io as io_utils
        rng = np.random.RandomState(5)
        arr = rng.randint(0, 65536, (16, 16), np.uint16)
        p = str(tmp_path / "d16.png")
        _write_png(p, arr)
        np.testing.assert_array_equal(io_utils.load_image(p), arr)
