"""search_by_projection unit tests, including the max_candidates
compaction path (large maps must not change matching results when the
candidate budget covers all usable points)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_test_tpu.engine.frame import FrameData
from orb_slam2_test_tpu.engine.matchers import search_by_projection
from orb_slam2_test_tpu.geometry.camera import PinholeCamera, project


CAM = PinholeCamera(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                    width=320, height=240)


def _scene(rng, P=512, N=128, n_real=100):
    """n_real map points projected exactly onto n_real features with
    matching descriptors; the rest of both sides is clutter."""
    xyz = np.zeros((P, 3), np.float32)
    xyz[:, 0] = rng.uniform(-1.5, 1.5, P)
    xyz[:, 1] = rng.uniform(-1.0, 1.0, P)
    xyz[:, 2] = rng.uniform(4.0, 8.0, P)
    desc = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    valid = np.zeros(P, bool)
    valid[:n_real] = True
    # extra valid clutter points that project outside the image
    valid[n_real : n_real + 50] = True
    xyz[n_real : n_real + 50, 0] = 100.0

    uv, z = project(CAM, jnp.asarray(xyz))
    uv = np.asarray(uv)

    f_uv = np.zeros((N, 2), np.float32)
    f_desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    f_valid = np.ones(N, bool)
    f_uv[:, 0] = rng.uniform(0, CAM.width, N)
    f_uv[:, 1] = rng.uniform(0, CAM.height, N)
    f_uv[:n_real] = uv[:n_real]
    f_desc[:n_real] = desc[:n_real]

    dist = np.linalg.norm(xyz, axis=1).astype(np.float32)
    frame = FrameData(
        uv=jnp.asarray(f_uv),
        uv_raw=jnp.asarray(f_uv),
        level=jnp.zeros(N, jnp.int32),
        angle=jnp.zeros(N, jnp.float32),
        desc=jnp.asarray(f_desc),
        valid=jnp.asarray(f_valid),
        ur=jnp.full((N,), -1.0, jnp.float32),
        depth=jnp.full((N,), -1.0, jnp.float32),
        timestamp=jnp.asarray(0.0, jnp.float32),
    )
    args = (
        CAM, jnp.eye(4),
        jnp.asarray(xyz), jnp.asarray(desc), jnp.asarray(valid),
        jnp.asarray(xyz / dist[:, None]),
        # level-0 observation: max_dist == current distance, so the
        # predicted octave is 0 and matches the features' level
        jnp.asarray(dist / 1.2**7), jnp.asarray(dist * 1.0),
        jnp.arange(P, dtype=jnp.int32), frame,
    )
    return args, n_real


def test_projection_match_finds_planted_matches(rng):
    args, n_real = _scene(rng)
    pm = search_by_projection(*args, radius=6.0, check_view_cos=False)
    assert int(pm.n_matches) >= int(0.9 * n_real)
    fp = np.asarray(pm.feat_pt)
    hit = fp[:n_real]
    agree = (hit == np.arange(n_real)).mean()
    assert agree > 0.9


def test_max_candidates_is_lossless_when_budget_covers(rng):
    """With a candidate budget >= the usable-point count, the compacted
    path must return exactly the dense result."""
    args, n_real = _scene(rng)
    dense = search_by_projection(*args, radius=6.0, check_view_cos=False)
    compact = search_by_projection(
        *args, radius=6.0, check_view_cos=False, max_candidates=256
    )
    np.testing.assert_array_equal(
        np.asarray(dense.feat_pt), np.asarray(compact.feat_pt)
    )
    np.testing.assert_array_equal(
        np.asarray(dense.pt_feat), np.asarray(compact.pt_feat)
    )
    assert int(dense.n_matches) == int(compact.n_matches)


def test_max_candidates_caps_the_candidate_set(rng):
    args, n_real = _scene(rng)
    capped = search_by_projection(
        *args, radius=6.0, check_view_cos=False, max_candidates=32
    )
    assert 0 < int(capped.n_matches) <= 32
    fp = np.asarray(capped.feat_pt)
    # every reported match must be a real (usable) point id
    assert fp.max() < 512
    assert ((fp >= 0).sum()) == int(capped.n_matches)
