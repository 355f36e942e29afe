"""Tests for the ORB frontend: FAST, pyramid, descriptors, matching."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.ops.fast import fast_response, nms_3x3, border_mask
from orb_slam2_test_tpu.ops.pyramid import build_pyramid, gaussian_blur
from orb_slam2_test_tpu.ops.brief import (
    pack_bits,
    unpack_bits,
    brief_pattern,
    orientation_maps,
)
from orb_slam2_test_tpu.ops.extractor import extract_orb, level_feature_budget
from orb_slam2_test_tpu.ops.matching import (
    hamming_matrix,
    hamming_popcount,
    match_descriptors,
    rotation_consistency,
)
from orb_slam2_test_tpu.utils.synthetic import (
    default_camera,
    make_landmarks,
    render_frame,
)


def _corner_image(h=64, w=64):
    """Bright square on dark background -> strong corners at its corners."""
    img = np.full((h, w), 20.0, np.float32)
    img[20:44, 20:44] = 220.0
    return jnp.asarray(img)


class TestFast:
    def test_detects_square_corners(self):
        img = _corner_image()
        corner, score = fast_response(img, 20.0)
        score = np.asarray(nms_3x3(jnp.where(border_mask(64, 64, 5), score, 0)))
        ys, xs = np.nonzero(score)
        pts = set(zip(ys.tolist(), xs.tolist()))
        assert len(pts) >= 4
        # each square corner should have a detection within 3 px
        for cy, cx in [(20, 20), (20, 43), (43, 20), (43, 43)]:
            assert any(abs(y - cy) <= 3 and abs(x - cx) <= 3 for y, x in pts)

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 128.0)
        corner, score = fast_response(img, 7.0)
        assert not bool(jnp.any(corner))

    def test_threshold_monotone(self):
        img = _corner_image()
        c_lo, _ = fast_response(img, 7.0)
        c_hi, _ = fast_response(img, 60.0)
        # high-threshold corners are a subset of low-threshold ones
        assert bool(jnp.all(jnp.logical_not(c_hi) | c_lo))


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((480, 640))
        pyr = build_pyramid(img, 8, 1.2)
        assert len(pyr) == 8
        assert pyr[0].shape == (480, 640)
        assert pyr[1].shape == (400, 533)
        for a, b in zip(pyr, pyr[1:]):
            assert b.shape[0] < a.shape[0]

    def test_blur_preserves_mean(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)), dtype=jnp.float32)
        out = gaussian_blur(img)
        assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 2.0


class TestBriefBits:
    def test_pack_unpack_roundtrip(self, rng):
        bits = jnp.asarray(rng.integers(0, 2, (16, 256)).astype(bool))
        np.testing.assert_array_equal(
            np.asarray(unpack_bits(pack_bits(bits))), np.asarray(bits)
        )

    def test_pattern_in_bounds(self):
        pat = brief_pattern()
        assert pat.shape == (256, 2, 2)
        r2 = (pat.astype(np.int64) ** 2).sum(axis=-1)
        assert (r2 <= 13 * 13).all()

    def test_orientation_gradient(self):
        # horizontal intensity ramp -> centroid along +x -> angle ~ 0
        img = jnp.asarray(
            np.tile(np.arange(64, dtype=np.float32), (64, 1))
        )
        ang = np.asarray(orientation_maps(img))
        assert abs(ang[32, 32]) < 0.1
        # vertical ramp -> angle ~ pi/2
        ang_v = np.asarray(orientation_maps(img.T))
        assert abs(ang_v[32, 32] - np.pi / 2) < 0.1


class TestHamming:
    def test_matmul_equals_popcount(self, rng):
        a = jnp.asarray(rng.integers(0, 2**32, (33, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (17, 8), dtype=np.uint32))
        d1 = np.asarray(hamming_matrix(a, b))
        d2 = np.asarray(hamming_popcount(a[:, None, :], b[None, :, :]))
        np.testing.assert_array_equal(d1, d2)

    def test_zero_distance_on_self(self, rng):
        a = jnp.asarray(rng.integers(0, 2**32, (5, 8), dtype=np.uint32))
        d = np.asarray(hamming_matrix(a, a))
        assert (np.diag(d) == 0).all()


class TestExtractor:
    def test_budget_sums_to_total(self):
        b = level_feature_budget(1000, 8, 1.2)
        assert sum(b) == 1000
        assert all(x > 0 for x in b)
        assert b[0] > b[-1]

    def test_extract_on_synthetic(self, rng):
        cam = default_camera()
        lms = make_landmarks(rng, 150)
        inten = rng.uniform(120, 255, 150).astype(np.float32)
        img = render_frame(cam, np.eye(4, dtype=np.float32), lms, inten)
        feats = extract_orb(jnp.asarray(img), n_features=300)
        n_valid = int(feats.valid.sum())
        assert n_valid > 50
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < cam.width).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < cam.height).all()
        # multiple levels populated
        levels = np.asarray(feats.level)[np.asarray(feats.valid)]
        assert len(np.unique(levels)) >= 2

    def test_matching_across_views(self, rng):
        """Features must match between two nearby views of the same scene."""
        cam = default_camera()
        lms = make_landmarks(rng, 200)
        inten = rng.uniform(120, 255, 200).astype(np.float32)
        T0 = np.eye(4, dtype=np.float32)
        from orb_slam2_test_tpu.geometry.se3 import se3_exp

        T1 = np.asarray(
            se3_exp(jnp.array([0.3, 0.02, 0.0, 0.002, 0.01, 0.002]))
        )
        img0 = render_frame(cam, T0, lms, inten)
        img1 = render_frame(cam, T1, lms, inten)
        f0 = extract_orb(jnp.asarray(img0), n_features=300)
        f1 = extract_orb(jnp.asarray(img1), n_features=300)
        idx, dist = match_descriptors(
            f0.desc, f1.desc, f0.valid, f1.valid, max_dist=64
        )
        idx = rotation_consistency(idx, f0.angle, f1.angle)
        n_matches = int((idx >= 0).sum())
        assert n_matches > 30, f"only {n_matches} matches"
        # matched descriptors should be close in pixel space after the
        # small camera motion (most blobs shift by < 40 px)
        m = np.asarray(idx)
        sel = m >= 0
        uv0 = np.asarray(f0.uv)[sel]
        uv1 = np.asarray(f1.uv)[m[sel]]
        disp = np.linalg.norm(uv0 - uv1, axis=1)
        assert np.median(disp) < 40.0
