"""Multi-sequence joint distributed BA (BASELINE config 5): merge the
maps of independently-tracked sequences into one block-diagonal problem,
point-shard it over the virtual 8-device mesh, and check each sequence's
solution matches what it would get solving alone."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_test_tpu.geometry.se3 import (
    se3_apply,
    se3_exp,
    se3_inverse,
    se3_log,
)
from orb_slam2_test_tpu.geometry.camera import PinholeCamera, project
from orb_slam2_test_tpu.slam_map.mapstate import (
    MapCapacity,
    make_empty_map,
    add_keyframe,
    add_points,
)
from orb_slam2_test_tpu.parallel.dist_ba import (
    dist_bundle_adjust,
    make_ba_mesh,
    shard_problem,
)
from orb_slam2_test_tpu.parallel.multi_map import (
    measure_scaling,
    compact_problem,
    joint_bundle_adjust,
    merge_problems,
)
from orb_slam2_test_tpu.utils.synthetic import make_landmarks

N_PTS = 48
N_KF = 4
CAP = MapCapacity(max_keyframes=8, max_features=N_PTS, max_points=96)


def _make_seq_map(rng, cam, shift, pose_noise=0.015, pt_noise=0.04,
                  px_noise=0.25):
    """A MapState whose keyframes observe a private landmark cloud, with
    perturbed poses/points; returns (map, T_true [n_kf,4,4], pt_slots)."""
    X_true = np.asarray(make_landmarks(rng, N_PTS, spread=2.0)) + shift
    T_true = np.stack(
        [
            np.asarray(
                se3_exp(
                    jnp.asarray(
                        np.array([0.1, 0.01, 0.0, 0.002, 0.012, 0.0]) * i,
                        jnp.float32,
                    )
                )
            )
            for i in range(N_KF)
        ]
    )

    m = make_empty_map(CAP)
    X0 = X_true + rng.normal(0, pt_noise, X_true.shape)
    m, pt_slots = add_points(
        m,
        jnp.asarray(X0, jnp.float32),
        jnp.zeros((N_PTS, 8), jnp.uint32),
        jnp.zeros((N_PTS, 3), jnp.float32),
        jnp.zeros((N_PTS,), jnp.float32),
        jnp.full((N_PTS,), 100.0, jnp.float32),
        jnp.asarray(0, jnp.int32),
        jnp.ones((N_PTS,), bool),
    )
    pt_slots = np.asarray(pt_slots)

    for i in range(N_KF):
        uv, z = project(cam, se3_apply(jnp.asarray(T_true[i]), jnp.asarray(X_true)))
        uv = uv + jnp.asarray(rng.normal(0, px_noise, (N_PTS, 2)), jnp.float32)
        Tcw0 = T_true[i]
        if i > 1:  # perturb all but the two mono-gauge keyframes
            d = jnp.asarray(rng.normal(0, pose_noise, 6), jnp.float32)
            Tcw0 = np.asarray(se3_exp(d) @ jnp.asarray(Tcw0))
        m, _ = add_keyframe(
            m,
            jnp.asarray(Tcw0, jnp.float32),
            float(i),
            i,
            uv,
            jnp.zeros((N_PTS,), jnp.int32),
            jnp.zeros((N_PTS,), jnp.float32),
            jnp.full((N_PTS,), -1.0),
            jnp.full((N_PTS,), -1.0),
            jnp.zeros((N_PTS, 8), jnp.uint32),
            jnp.ones((N_PTS,), bool),
            jnp.asarray(pt_slots, jnp.int32),
        )
    return m, T_true, pt_slots


def _pose_errs(m, T_true):
    errs = []
    for i in range(N_KF):
        e = se3_log(jnp.asarray(np.asarray(m.kf_Tcw)[i]) @ se3_inverse(jnp.asarray(T_true[i])))
        errs.append(float(jnp.linalg.norm(e[:3])))
    return errs


def test_joint_ba_improves_both_sequences(rng):
    cam_a = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0)
    cam_b = PinholeCamera(fx=710.0, fy=710.0, cx=300.0, cy=230.0)
    m_a, T_a, _ = _make_seq_map(rng, cam_a, shift=0.0)
    m_b, T_b, _ = _make_seq_map(rng, cam_b, shift=1.5)

    pre_a = _pose_errs(m_a, T_a)
    pre_b = _pose_errs(m_b, T_b)

    mesh = make_ba_mesh(8)
    (n_a, n_b), info = joint_bundle_adjust(
        [m_a, m_b], [cam_a, cam_b], mesh, iters=12
    )
    assert info["n_devices"] == 8
    assert info["n_cams"] == 2 * N_KF

    post_a = _pose_errs(n_a, T_a)
    post_b = _pose_errs(n_b, T_b)
    # every non-gauge pose must end up much closer to truth than the
    # injected perturbation (mono gauge: scale can wiggle, so compare
    # against the pre-BA error rather than an absolute bound)
    assert max(post_a[1:]) < 0.35 * max(pre_a[1:]), (pre_a, post_a)
    assert max(post_b[1:]) < 0.35 * max(pre_b[1:]), (pre_b, post_b)


def test_joint_matches_independent_solves(rng):
    """Block-diagonal exactness: the joint solve must reproduce each
    sequence's own distributed BA (same LM trajectory — identical math,
    just concatenated), within LM-damping tolerance."""
    cam_a = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0)
    cam_b = PinholeCamera(fx=710.0, fy=705.0, cx=300.0, cy=230.0)
    m_a, T_a, _ = _make_seq_map(rng, cam_a, shift=0.0)
    m_b, T_b, _ = _make_seq_map(rng, cam_b, shift=1.5)

    mesh = make_ba_mesh(4)
    (j_a, j_b), _ = joint_bundle_adjust(
        [m_a, m_b], [cam_a, cam_b], mesh, iters=10
    )

    for m, cam, T_true, joint in [
        (m_a, cam_a, T_a, j_a),
        (m_b, cam_b, T_b, j_b),
    ]:
        part = compact_problem(m)
        sp = shard_problem(part.prob, 4)
        Tcw, _, _ = dist_bundle_adjust(sp, cam, mesh, iters=10)
        solo_err = [
            float(
                jnp.linalg.norm(
                    se3_log(Tcw[i] @ se3_inverse(jnp.asarray(T_true[i])))[:3]
                )
            )
            for i in range(1, N_KF)
        ]
        joint_err = _pose_errs(joint, T_true)[1:]
        # both should land in the same basin near truth
        assert max(joint_err) < max(max(solo_err) * 2.0, 0.01)


def test_compact_problem_skips_tiny_maps(rng):
    m = make_empty_map(CAP)
    assert compact_problem(m) is None
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0)
    maps, info = joint_bundle_adjust([m], [cam], make_ba_mesh(2))
    assert info["n_cams"] == 0
    assert maps[0] is m


def test_max_cams_fixes_old_keyframes(rng):
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0)
    m, T_true, _ = _make_seq_map(rng, cam, shift=0.0)
    part = compact_problem(m, max_cams=2)
    fixed = np.asarray(part.prob.cam_fixed)
    assert fixed[: N_KF - 2].all() and not fixed[N_KF - 2 :].any()


def test_concurrent_systems_with_joint_ba(rng):
    """The multi_seq driver's core loop: two Systems track their own
    synthetic sequences round-robin; a joint distributed BA runs
    mid-stream and both keep tracking afterwards."""
    from orb_slam2_test_tpu.system import System, MONOCULAR
    from orb_slam2_test_tpu.io.settings import SlamSettings
    from orb_slam2_test_tpu.utils.synthetic import (
        default_camera,
        make_sequence,
    )

    n_frames = 10
    overrides = dict(
        ba_fixed_cap=4, n_triangulate_neighbors=2, min_init_matches=40,
        min_init_triangulated=30, max_frames_between_kf=4,
        min_local_inliers=20,
    )
    systems, seqs = [], []
    # seeds chosen so both synthetic scenes have enough texture/parallax
    # for monocular init (weak scenes legitimately refuse to initialize,
    # same as the reference's H/F model-selection gates)
    for seed in (0, 4):
        seq_rng = np.random.default_rng(seed)
        cam = default_camera(320, 240)
        cam, poses_gt, landmarks, images = make_sequence(
            seq_rng, n_frames, cam=cam, n_landmarks=160,
            step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
        )
        settings = SlamSettings(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height,
            n_features=400, max_keyframes=32, max_points=4096,
            local_kf_cap=8, ba_pt_cap=1024, fps=10.0,
        )
        systems.append(System(settings, sensor=MONOCULAR, **overrides))
        seqs.append(images)

    split = 7
    for i in range(split):
        for sys_, images in zip(systems, seqs):
            sys_.track_monocular(images[i], 0.1 * i)
    assert all(s.tracking_state == "OK" for s in systems)

    from orb_slam2_test_tpu.parallel.multi_map import joint_bundle_adjust

    maps = [s.tracker.map for s in systems]
    cams = [s.tracker.cam for s in systems]
    new_maps, info = joint_bundle_adjust(
        maps, cams, make_ba_mesh(8), iters=6,
        scale_factor=systems[0].tracker.cap.scale_factor,
    )
    assert info["n_devices"] == 8 and info["n_cams"] >= 4
    assert np.isfinite(info["cost"])
    for s, m in zip(systems, new_maps):
        s.tracker.map = m

    for i in range(split, n_frames):
        for sys_, images in zip(systems, seqs):
            sys_.track_monocular(images[i], 0.1 * i)
    assert all(s.tracking_state == "OK" for s in systems)


def test_measure_scaling_smoke(rng):
    cam = PinholeCamera(fx=520.0, fy=520.0, cx=320.0, cy=240.0)
    m, _, _ = _make_seq_map(rng, cam, shift=0.0)
    rep = measure_scaling(
        [m], [cam], iters=2, device_counts=[1, 2], repeats=1
    )
    assert rep["metric"] == "dist_ba_strong_scaling"
    assert set(rep["efficiency"]) == {"1", "2"}
    assert rep["efficiency"]["1"] == 1.0
