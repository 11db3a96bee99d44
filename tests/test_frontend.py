"""Tests for SuperPoint forward shape/behavior and keypoint selection."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.models import superpoint
from dani_slam_tpu.ops import frontend, image

RNG = np.random.RandomState(3)


class TestSuperPoint:
    def test_forward_shapes(self):
        params = superpoint.init_params(jax.random.PRNGKey(0), 64, 96)
        heat, desc = superpoint.apply(params, jnp.zeros((64, 96)))
        assert heat.shape == (64, 96)
        assert desc.shape == (8, 12, 256)

    def test_heatmap_is_probability(self):
        params = superpoint.init_params(jax.random.PRNGKey(0), 64, 64)
        g = jnp.asarray(RNG.rand(64, 64), jnp.float32)
        heat, desc = superpoint.apply(params, g)
        assert float(heat.min()) >= 0.0 and float(heat.max()) <= 1.0
        norms = jnp.linalg.norm(desc, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


class TestNMS:
    def test_local_maxima_survive(self):
        h = jnp.zeros((32, 32)).at[10, 10].set(0.9).at[10, 12].set(0.5)
        out = frontend.nms_heatmap(h, radius=4)
        assert abs(float(out[10, 10]) - 0.9) < 1e-6
        assert float(out[10, 12]) == 0.0   # suppressed by stronger neighbor

    def test_distant_peaks_kept(self):
        h = jnp.zeros((64, 64)).at[10, 10].set(0.9).at[40, 40].set(0.8)
        out = frontend.nms_heatmap(h, radius=4)
        assert abs(float(out[10, 10]) - 0.9) < 1e-6
        assert abs(float(out[40, 40]) - 0.8) < 1e-6


class TestSelect:
    def test_selects_planted_peaks(self):
        h = jnp.zeros((128, 128))
        peaks = [(20, 30, 0.9), (60, 90, 0.8), (100, 50, 0.7)]
        for y, x, s in peaks:
            h = h.at[y, x].set(s)
        xy, score, valid = frontend.select_keypoints(h, n_max=16,
                                                     threshold=0.1)
        got = {(int(x), int(y)) for (x, y), v in
               zip(np.asarray(xy), np.asarray(valid)) if v}
        assert got == {(30, 20), (90, 60), (50, 100)}
        assert abs(float(score[0]) - 0.9) < 1e-6

    def test_border_suppression(self):
        h = jnp.zeros((64, 64)).at[2, 2].set(0.9).at[32, 32].set(0.5)
        xy, score, valid = frontend.select_keypoints(h, n_max=8, threshold=0.1,
                                                     border=8)
        got = {(int(x), int(y)) for (x, y), v in
               zip(np.asarray(xy), np.asarray(valid)) if v}
        assert got == {(32, 32)}

    def test_spatial_spread_cap(self):
        # 20 peaks crammed in one cell: at most k_cell survive from it
        h = jnp.zeros((128, 128))
        for i in range(20):
            # spread >nms radius apart within rows but same 16px cell band
            h = h.at[16 + (i % 2) * 10, 16 + (i // 2) * 5].set(0.5 + 0.01 * i)
        xy, score, valid = frontend.select_keypoints(
            h, n_max=64, threshold=0.1, cell=16, k_cell=4, nms_radius=1)
        n = int(valid.sum())
        assert n <= 4 * 6  # at most k_cell per touched cell

    def test_fixed_output_shape(self):
        h = jnp.zeros((97, 131)).at[50, 60].set(0.9)  # non-multiple sizes
        xy, score, valid = frontend.select_keypoints(h, n_max=32, threshold=0.1)
        assert xy.shape == (32, 2) and valid.shape == (32,)
        assert int(valid.sum()) == 1


class TestDynamicMask:
    def test_suppress_in_boxes(self):
        xy = jnp.asarray([[10.0, 10.0], [50.0, 50.0], [90.0, 90.0]])
        valid = jnp.ones(3, bool)
        boxes = jnp.asarray([[40.0, 40.0, 60.0, 60.0],
                             [0.0, 0.0, 0.0, 0.0]])
        box_mask = jnp.asarray([True, False])
        out = frontend.suppress_in_boxes(xy, valid, boxes, box_mask)
        np.testing.assert_array_equal(np.asarray(out), [True, False, True])

    def test_inactive_box_ignored(self):
        xy = jnp.asarray([[10.0, 10.0]])
        out = frontend.suppress_in_boxes(
            xy, jnp.ones(1, bool),
            jnp.asarray([[0.0, 0.0, 100.0, 100.0]]), jnp.asarray([False]))
        assert bool(out[0])


class TestDescriptorSampling:
    def test_exact_at_grid_centers(self):
        D = 8
        dm = jnp.asarray(RNG.randn(16, 16, D), jnp.float32)
        dm = dm / jnp.linalg.norm(dm, axis=-1, keepdims=True)
        # pixel coords exactly at descriptor-cell centers: x = 8*i + 3.5
        xy = jnp.asarray([[8 * 3 + 3.5, 8 * 5 + 3.5]])
        d = frontend.sample_descriptors(dm, xy, stride=8)
        np.testing.assert_allclose(np.asarray(d[0]), np.asarray(dm[5, 3]),
                                   atol=1e-5)

    def test_unit_norm(self):
        dm = jnp.asarray(RNG.randn(8, 8, 16), jnp.float32)
        xy = jnp.asarray(RNG.uniform(0, 63, (32, 2)), jnp.float32)
        d = frontend.sample_descriptors(dm, xy)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)),
                                   1.0, atol=1e-4)


class TestImageOps:
    def test_gray_conversion(self):
        rgb = jnp.full((4, 4, 3), 255, jnp.uint8)
        g = image.to_gray01(rgb)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-3)

    def test_pyramid_shapes(self):
        img = jnp.zeros((480, 640))
        lv = image.gaussian_pyramid(img, 3, 1.2)
        assert lv[0].shape == (480, 640)
        assert lv[1].shape == (400, 533)

    def test_remap_identity(self):
        img = jnp.asarray(RNG.rand(32, 32), jnp.float32)
        yy, xx = jnp.mgrid[0:32, 0:32]
        out = image.remap_bilinear(img, xx.astype(jnp.float32),
                                   yy.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_extract_end_to_end(self):
        params = superpoint.init_params(jax.random.PRNGKey(0), 64, 64)
        g = jnp.asarray(RNG.rand(64, 64), jnp.float32)
        heat, dm = superpoint.apply(params, g)
        out = frontend.extract(heat, dm, n_max=64, threshold=0.0)
        assert out["xy"].shape == (64, 2)
        assert out["desc"].shape == (64, 256)


class TestMultiscale:
    def test_levels_and_budgets(self):
        params = superpoint.init_params(jax.random.PRNGKey(0), 96, 96)
        g = jnp.asarray(RNG.rand(96, 96), jnp.float32)
        out = frontend.extract_multiscale(params, g, n_max=64, n_levels=3,
                                          threshold=0.0)
        assert out["xy"].shape == (64, 2)
        assert out["octave"].shape == (64,)
        octs = set(np.asarray(out["octave"]).tolist())
        assert octs == {0, 1, 2}

    def test_coords_rescaled_to_level0(self):
        params = superpoint.init_params(jax.random.PRNGKey(0), 96, 96)
        g = jnp.asarray(RNG.rand(96, 96), jnp.float32)
        out = frontend.extract_multiscale(params, g, n_max=64, n_levels=2,
                                          threshold=0.0)
        xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
        assert (xy[:, 0] <= 96).all() and (xy[:, 1] <= 96).all()


class TestMultiscale:
    def test_extract_multiscale_levels_and_coords(self):
        """Pyramid extraction (reference: SPextractor per-level forward +
        rescale to level-0 coords, src/SPextractor.cpp:130-217): octave ids
        populated, per-level budgets follow the geometric series, level-0
        coords stay in image bounds."""
        params = superpoint.init_params(jax.random.PRNGKey(0))
        g = jnp.asarray(RNG.rand(120, 160).astype(np.float32))
        out = frontend.extract_multiscale(params, g, n_max=256, n_levels=3,
                                          scale_factor=1.2, threshold=-1.0)
        assert out["xy"].shape == (256, 2)
        assert out["octave"].shape == (256,)
        oct_np = np.asarray(out["octave"])
        assert set(np.unique(oct_np)) == {0, 1, 2}
        # geometric budgets: level 0 largest
        n0 = (oct_np == 0).sum()
        n2 = (oct_np == 2).sum()
        assert n0 > n2
        xy = np.asarray(out["xy"])
        v = np.asarray(out["valid"])
        assert (xy[v, 0] < 160).all() and (xy[v, 1] < 120).all()
        # higher-level coords were rescaled: level-2 keypoints still span
        # the full level-0 range
        assert xy[v & (oct_np == 2), 0].max() > 80

    def test_build_frame_mono_multiscale(self):
        from dani_slam_tpu.core import cameras
        from dani_slam_tpu.slam import frame as frame_mod
        params = superpoint.init_params(jax.random.PRNGKey(0))
        cam = cameras.Camera.pinhole(100.0, 100.0, 80.0, 60.0, 160, 120)
        img = RNG.rand(120, 160).astype(np.float32)
        feat = frame_mod.build_frame_mono(params, img, cam, 0.0, n_max=128,
                                          n_levels=3, threshold=-1.0)
        assert feat.octave is not None
        assert feat.octave.shape == (128,)
        assert int(feat.octave.max()) == 2
