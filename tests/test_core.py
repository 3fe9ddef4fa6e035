"""Unit tests: transforms, camera backprojection, color maps, likelihood math."""

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.core import camera, color, transforms
from kimera_semantics_tpu.config import SemanticConfig, UNKNOWN_LABEL
from kimera_semantics_tpu.ops import semantic as sem_ops


class TestTransforms:
    def test_identity_roundtrip(self):
        t = transforms.identity()
        pts = jnp.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(transforms.apply(t, pts), pts)

    def test_quat_rotation(self):
        # 90 degrees about z: (x,y,z) -> (-y,x,z)
        q = jnp.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
        t = transforms.from_quat_trans(q, jnp.array([1.0, 0.0, 0.0]))
        out = transforms.apply(t, jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)

    def test_compose_inverse(self):
        rng = np.random.RandomState(0)
        q = rng.randn(4)
        t = transforms.from_quat_trans(jnp.array(q), jnp.array(rng.randn(3)))
        eye = transforms.compose(t, transforms.inverse(t))
        np.testing.assert_allclose(eye, np.eye(4), atol=1e-3)


class TestCamera:
    def test_backprojection_matches_pinhole_model(self):
        # Reference formula: x = (u - cx) z / fx (depth_map_to_pointcloud.h:245-274)
        intr = camera.PinholeIntrinsics(fx=100.0, fy=120.0, cx=2.0, cy=1.5,
                                        width=5, height=4)
        depth = jnp.full((4, 5), 2.0)
        pts, valid = camera.backproject(depth, intr)
        assert bool(valid.all())
        pts = np.asarray(pts).reshape(4, 5, 3)
        np.testing.assert_allclose(pts[1, 3], [(3 - 2.0) * 2 / 100.0,
                                               (1 - 1.5) * 2 / 120.0, 2.0], atol=1e-6)

    def test_invalid_depth_masked(self):
        intr = camera.PinholeIntrinsics(100, 100, 1, 1, 3, 3)
        depth = jnp.array([[1.0, 0.0, -1.0]] * 3)
        _, valid = camera.backproject(depth, intr)
        v = np.asarray(valid).reshape(3, 3)
        assert v[:, 0].all() and not v[:, 1].any() and not v[:, 2].any()

    def test_mm_conversion(self):
        d = camera.depth_from_millimeters(jnp.array([1500], dtype=jnp.uint16))
        np.testing.assert_allclose(d, [1.5])


class TestColor:
    CSV = "name,red,green,blue,alpha,id\nwall,10,20,30,255,3\nfloor,50,60,70,255,5\n"

    def test_csv_roundtrip(self):
        m = color.LabelColorMap.from_csv(self.CSV)
        labs = m.labels_from_colors(jnp.array([[10, 20, 30], [50, 60, 70]],
                                              dtype=jnp.uint8))
        np.testing.assert_array_equal(labs, [3, 5])
        np.testing.assert_array_equal(m.colors_from_labels(jnp.array([3, 5])),
                                      [[10, 20, 30], [50, 60, 70]])

    def test_white_is_unknown(self):
        # color.cpp:62-66 forces White <-> label 0.
        m = color.LabelColorMap.from_csv(self.CSV)
        labs = m.labels_from_colors(jnp.array([[255, 255, 255]], dtype=jnp.uint8))
        assert int(labs[0]) == UNKNOWN_LABEL

    def test_unknown_color_maps_to_zero(self):
        m = color.LabelColorMap.from_csv(self.CSV)
        labs = m.labels_from_colors(jnp.array([[1, 2, 3]], dtype=jnp.uint8))
        assert int(labs[0]) == UNKNOWN_LABEL

    def test_reference_csv_loads(self):
        import os
        path = ("/root/reference/kimera_semantics_ros/cfg/"
                "tesse_multiscene_office1_segmentation_mapping.csv")
        if not os.path.exists(path):
            pytest.skip("reference CSVs unavailable")
        m = color.LabelColorMap.from_csv(path)
        labs = m.labels_from_colors(jnp.array([[250, 50, 50]], dtype=jnp.uint8))
        assert int(labs[0]) == 2  # Books/Bookshelf row

    def test_numpy_fast_path_matches_jnp(self):
        # Host-LUT decode (ingestion path) must agree with the jit-safe
        # searchsorted path on every input class: mapped colors, White,
        # unmapped colors, random bytes.
        m = color.LabelColorMap.random(21, seed=3)
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 256, size=(64, 48, 3)).astype(np.uint8)
        rgb[0, 0] = (255, 255, 255)
        rgb[0, 1] = m.label_colors[7]
        host = m.labels_from_colors(rgb)
        assert isinstance(host, np.ndarray)
        dev = m.labels_from_colors(jnp.asarray(rgb))
        np.testing.assert_array_equal(host, np.asarray(dev))
        labs = host.astype(np.int32)
        np.testing.assert_array_equal(
            m.colors_from_labels(labs),
            np.asarray(m.colors_from_labels(jnp.asarray(labs))))
        # out-of-range ids clamp like the jnp gather
        np.testing.assert_array_equal(
            m.colors_from_labels(np.array([300, -2])),
            np.asarray(m.colors_from_labels(jnp.array([300, -2]))))

    def test_rainbow_range(self):
        vals = color.rainbow_colormap(jnp.linspace(0, 1, 16))
        assert vals.shape == (16, 3) and vals.dtype == jnp.uint8


class TestLikelihood:
    def test_matrix_structure(self):
        # semantic_integrator_base.cpp:93-128: diag log(p), off-diag log(1-p),
        # unknown column zeroed.
        cfg = SemanticConfig(semantic_measurement_probability=0.9)
        mat = sem_ops.likelihood_matrix(cfg, 21)
        assert mat.shape == (21, 21)
        np.testing.assert_allclose(np.diag(mat)[1:], np.log(0.9), rtol=1e-6)
        assert (mat[:, 0] == 0).all()
        assert np.isclose(mat[1, 2], np.log(0.1), rtol=1e-6)

    def test_decomposition_equals_matrix_product(self):
        # L @ onehot(l) == count*log(1-p)*ones + delta*e_l  (ops/semantic.py)
        cfg = SemanticConfig(semantic_measurement_probability=0.8)
        mat = sem_ops.likelihood_matrix(cfg, 21)
        lk = sem_ops.make_likelihood(cfg)
        for lab in [1, 7, 20]:
            onehot = np.zeros(21); onehot[lab] = 1.0
            expect = mat @ onehot
            got = np.full(21, lk.log_nonmatch); got[lab] += lk.delta
            np.testing.assert_allclose(got, expect, rtol=1e-6)
        onehot0 = np.zeros(21); onehot0[0] = 1.0
        np.testing.assert_allclose(mat @ onehot0, 0.0)

    def test_invalid_probability_raises(self):
        with pytest.raises(ValueError):
            sem_ops.make_likelihood(SemanticConfig(semantic_measurement_probability=1.0))

    def test_dynamic_label_mask(self):
        cfg = SemanticConfig(dynamic_labels=(20,))
        ok = sem_ops.dynamic_label_mask(jnp.array([0, 5, 20]), cfg)
        np.testing.assert_array_equal(ok, [True, True, False])
