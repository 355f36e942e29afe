"""Synthetic scene/image generation for tests and benchmarks.

The reference has no test suite; its de-facto tests are TUM/KITTI/EuRoC
dataset runs (SURVEY.md section 4). Those datasets are not available in
this sandbox, so we build the test pyramid on synthetic scenes with
exact ground truth: random 3D landmarks rendered as smooth blobs,
viewed from known camera trajectories.
"""

from __future__ import annotations

import numpy as np

from orb_slam2_test_tpu.geometry.camera import PinholeCamera


def default_camera(width: int = 320, height: int = 240) -> PinholeCamera:
    return PinholeCamera(
        fx=0.8 * width,
        fy=0.8 * width,
        cx=width / 2.0,
        cy=height / 2.0,
        width=width,
        height=height,
    )


def make_landmarks(
    rng: np.random.Generator,
    n: int = 400,
    depth_range: tuple[float, float] = (4.0, 10.0),
    spread: float = 6.0,
) -> np.ndarray:
    """Random 3D landmarks in front of the origin (z in depth_range)."""
    xy = rng.uniform(-spread, spread, size=(n, 2))
    z = rng.uniform(*depth_range, size=(n, 1))
    return np.concatenate([xy, z], axis=1).astype(np.float32)


_PATCH_R = 15  # textured patch half-size; must cover BRIEF's 13-px
# pattern radius so descriptor bits compare texture, not background


def _landmark_patches(n: int, seed: int = 7) -> np.ndarray:
    """[n, 2R+1, 2R+1] deterministic random textured patches.

    Each landmark renders as a distinctive smoothed random texture so
    that BRIEF descriptors are discriminative and orientation is stable
    (pure Gaussian blobs are radially symmetric — unmatchable)."""
    rng = np.random.default_rng(seed)
    size = 2 * _PATCH_R + 1
    pat = rng.uniform(0.0, 255.0, size=(n, size, size)).astype(np.float32)
    # Texture model tuned for ORB stability under viewpoint change
    # (measured on true-correspondence pairs; per-texel white noise
    # flips ~100/256 BRIEF bits across a 2-degree view change and
    # IC_Angle jitters by ~15-30 degrees, killing long-sequence
    # tracking):
    # 1) heavy smoothing (8x 3x3 box ~ Gaussian sigma 2.3 texels) for
    #    sub-pixel stability,
    # 2) median-threshold to TWO TONES — BRIEF then compares large
    #    uniform regions whose comparisons survive moderate affine
    #    warps, like the edge/corner structure of real images,
    # 3) an additive dominant-direction ramp to pin the intensity
    #    centroid (stable IC_Angle -> stable steered BRIEF).
    for _ in range(8):
        p = np.pad(pat, ((0, 0), (1, 1), (1, 1)), mode="edge")
        pat = (
            p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
            + p[:, 1:-1, :-2] + p[:, 1:-1, 1:-1] + p[:, 1:-1, 2:]
            + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:]
        ) / 9.0
    med = np.median(pat, axis=(1, 2), keepdims=True)
    pat = np.where(pat > med, 255.0, 40.0).astype(np.float32)
    yy, xx = np.mgrid[-_PATCH_R : _PATCH_R + 1, -_PATCH_R : _PATCH_R + 1]
    phi = rng.uniform(0.0, 2.0 * np.pi, size=n)
    ramp = 0.5 + 0.5 * (
        np.cos(phi)[:, None, None] * xx + np.sin(phi)[:, None, None] * yy
    ) / _PATCH_R
    pat = pat * 0.75 + 255.0 * 0.25 * ramp
    # one antialias pass over the hard two-tone edges
    p = np.pad(pat, ((0, 0), (1, 1), (1, 1)), mode="edge")
    pat = (
        p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
        + p[:, 1:-1, :-2] + p[:, 1:-1, 1:-1] + p[:, 1:-1, 2:]
        + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:]
    ) / 9.0
    # radial window so the patch fades into the background
    wnd = np.clip(1.3 - np.sqrt(yy**2 + xx**2) / _PATCH_R, 0.0, 1.0)
    return (pat * wnd[None]).astype(np.float32)


def render_frame(
    cam: PinholeCamera,
    Tcw: np.ndarray,
    landmarks: np.ndarray,
    intensities: np.ndarray,
    background: float = 16.0,
    patches: np.ndarray | None = None,
    normals: np.ndarray | None = None,
    ref_dist: np.ndarray | None = None,
    return_depth: bool = False,
):
    """Render landmarks as textured PLANAR QUADS in 3D -> [H, W] image.

    Each landmark is a small textured plane with a fixed world size,
    projected with the true (affine-approximated) homography per frame,
    so every texture corner moves exactly like a rigid 3D point —
    billboard sprites would violate rigidity and corrupt SLAM geometry
    on rotating trajectories. Pure NumPy (host-side test utility).

    normals: [n, 3] quad normals (default: -z, facing a camera near the
    origin); ref_dist: [n] nominal viewing distance fixing the quad's
    world size (default |X|).
    """
    h, w = cam.height, cam.width
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    n_lm = len(landmarks)
    if patches is None:
        patches = _landmark_patches(n_lm)
    if normals is None:
        normals = np.tile(
            np.array([0.0, 0.0, -1.0], np.float32), (n_lm, 1)
        )
    if ref_dist is None:
        ref_dist = np.linalg.norm(landmarks, axis=1)
    gain = intensities / 255.0
    size = 2 * _PATCH_R + 1

    pc = landmarks @ R.T + t
    z = pc[:, 2]
    vis = z > 0.5
    u0 = cam.fx * pc[:, 0] / np.maximum(z, 0.5) + cam.cx
    v0 = cam.fy * pc[:, 1] / np.maximum(z, 0.5) + cam.cy
    vis &= (u0 >= -25) & (u0 < w + 25) & (v0 >= -25) & (v0 < h + 25)

    # quad in-plane axes (world): e1 = up x n, e2 = n x e1
    up = np.array([0.0, 1.0, 0.0], np.float32)
    e1 = np.cross(np.tile(up, (n_lm, 1)), normals)
    n1 = np.linalg.norm(e1, axis=1, keepdims=True)
    e1 = e1 / np.maximum(n1, 1e-6)
    e2 = np.cross(normals, e1)
    texel = (ref_dist / cam.fx).astype(np.float32)  # 1 px at ref distance

    img = np.full((h, w), background, dtype=np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    ys_g, xs_g = np.mgrid[0:h, 0:w].astype(np.float32)

    for li in np.nonzero(vis)[0]:
        # camera-frame axes steps per texel
        d1 = R @ e1[li] * texel[li]
        d2 = R @ e2[li] * texel[li]
        x, y, zz = pc[li]
        # image Jacobian d(uv)/d(texel): du = fx (d1x z - x d1z)/z^2 ...
        A = np.array(
            [
                [
                    cam.fx * (d1[0] * zz - x * d1[2]) / zz**2,
                    cam.fx * (d2[0] * zz - x * d2[2]) / zz**2,
                ],
                [
                    cam.fy * (d1[1] * zz - y * d1[2]) / zz**2,
                    cam.fy * (d2[1] * zz - y * d2[2]) / zz**2,
                ],
            ]
        )
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        if abs(det) < 1e-9:
            continue
        Ainv = np.array(
            [[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]]
        ) / det
        # bounding box from transformed patch corners
        corners = A @ np.array(
            [[-_PATCH_R, _PATCH_R, -_PATCH_R, _PATCH_R],
             [-_PATCH_R, -_PATCH_R, _PATCH_R, _PATCH_R]],
            np.float32,
        )
        x0 = max(int(np.floor(u0[li] + corners[0].min())), 0)
        x1 = min(int(np.ceil(u0[li] + corners[0].max())) + 1, w)
        y0 = max(int(np.floor(v0[li] + corners[1].min())), 0)
        y1 = min(int(np.ceil(v0[li] + corners[1].max())) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        px = xs_g[y0:y1, x0:x1] - u0[li]
        py = ys_g[y0:y1, x0:x1] - v0[li]
        t1 = Ainv[0, 0] * px + Ainv[0, 1] * py  # texel coords
        t2 = Ainv[1, 0] * px + Ainv[1, 1] * py
        inside = (np.abs(t1) < _PATCH_R) & (np.abs(t2) < _PATCH_R)
        if not inside.any():
            continue
        # bilinear texture sample
        tx = np.clip(t1 + _PATCH_R, 0, size - 1.001)
        ty = np.clip(t2 + _PATCH_R, 0, size - 1.001)
        ix = tx.astype(np.int32)
        iy = ty.astype(np.int32)
        fx_ = tx - ix
        fy_ = ty - iy
        p = patches[li] * gain[li]
        val = (
            p[iy, ix] * (1 - fy_) * (1 - fx_)
            + p[iy, ix + 1] * (1 - fy_) * fx_
            + p[iy + 1, ix] * fy_ * (1 - fx_)
            + p[iy + 1, ix + 1] * fy_ * fx_
        )
        # exact per-pixel depth on the quad surface
        zq = zz + t1 * d1[2] + t2 * d2[2]
        sub_img = img[y0:y1, x0:x1]
        sub_z = zbuf[y0:y1, x0:x1]
        put = inside & (zq < sub_z)
        sub_img[put] = val[put]
        sub_z[put] = zq[put]
    img = np.clip(img, 0.0, 255.0)
    if return_depth:
        depth = np.where(np.isfinite(zbuf), zbuf, 0.0).astype(np.float32)
        return img, depth
    return img


def make_loop_trajectory(
    n_frames: int,
    radius: float = 50.0,
    revolutions: float = 1.08,
    y_wobble: float = 0.15,
) -> np.ndarray:
    """Circular driving loop in the x-z plane, camera facing along the
    tangent (a KITTI-like closed loop: the end revisits the start, so
    place recognition must fire). Returns Tcw [n, 4, 4].

    revolutions > 1 gives post-loop overlap frames; y_wobble adds a
    slow vertical oscillation so the trajectory is not exactly planar
    (degenerate for homography-based checks).
    """
    thetas = np.linspace(
        0.0, 2.0 * np.pi * revolutions, n_frames, dtype=np.float64
    )
    poses = np.zeros((n_frames, 4, 4), np.float32)
    for i, th in enumerate(thetas):
        p = np.array(
            [
                radius * np.cos(th),
                y_wobble * np.sin(3.0 * th),
                radius * np.sin(th),
            ]
        )
        z_cam = np.array([-np.sin(th), 0.0, np.cos(th)])  # tangent
        y_cam = np.array([0.0, 1.0, 0.0])
        x_cam = np.cross(y_cam, z_cam)
        R_wc = np.stack([x_cam, y_cam, z_cam], axis=1)
        Tcw = np.eye(4)
        Tcw[:3, :3] = R_wc.T
        Tcw[:3, 3] = -R_wc.T @ p
        poses[i] = Tcw
    return poses


def make_loop_scene(
    rng: np.random.Generator,
    n_landmarks: int,
    radius: float = 50.0,
    wall_near: float = 3.0,
    wall_far: float = 12.0,
    y_spread: float = 4.0,
):
    """Landmark field lining a circular corridor: textured quads on the
    inner and outer 'walls', facing the path. Returns (landmarks [m,3],
    intensities [m], patches, normals [m,3], ref_dist [m])."""
    th = rng.uniform(0.0, 2.0 * np.pi, size=n_landmarks)
    side = np.where(rng.uniform(size=n_landmarks) < 0.5, 1.0, -1.0)
    off = rng.uniform(wall_near, wall_far, size=n_landmarks)
    r = radius + side * off
    y = rng.uniform(-y_spread, y_spread, size=n_landmarks)
    landmarks = np.stack(
        [r * np.cos(th), y, r * np.sin(th)], axis=1
    ).astype(np.float32)
    # quad normal: face the point on the path from which the quad is
    # typically SEEN — ~20 METERS of arc behind its own angular
    # position (the camera travels counter-clockwise looking along the
    # tangent). Purely radial normals leave every quad nearly edge-on
    # to the camera, which smears the texture with viewpoint and makes
    # descriptors decay as the camera advances. The offset must be in
    # arc length, not a fixed angle: a fixed 0.35 rad put the viewpoint
    # 38 m back at radius 110, rendering whole arc segments edge-on
    # (feature counts collapsed to ~300/2000 and tracking died).
    th_view = th - 20.0 / max(radius, 1.0)
    viewpoint = np.stack(
        [
            radius * np.cos(th_view),
            np.zeros_like(th_view),
            radius * np.sin(th_view),
        ],
        axis=1,
    )
    normals = viewpoint - landmarks
    normals = (
        normals / np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-6)
    ).astype(np.float32)
    # multi-scale quads: log-uniform size spread so corners appear
    # across the pyramid octaves (all-1px-texel quads put every feature
    # at level 0, whose scale-invariance distance band [max/3.6, 1.2max]
    # is the tightest — a receding camera sheds such points after a 20%
    # distance change, which no real scene does uniformly)
    size_mult = np.exp(
        rng.uniform(np.log(1.0), np.log(5.0), size=n_landmarks)
    )
    ref_dist = (
        np.linalg.norm(viewpoint - landmarks, axis=1) * size_mult
    ).astype(np.float32)
    intensities = rng.uniform(120.0, 255.0, size=n_landmarks).astype(
        np.float32
    )
    patches = _landmark_patches(n_landmarks, seed=int(rng.integers(1 << 30)))
    return landmarks, intensities, patches, normals, ref_dist


def render_loop_sequence(
    rng: np.random.Generator,
    n_frames: int,
    cam: PinholeCamera,
    n_landmarks: int = 4000,
    radius: float = 50.0,
    baseline: float = 0.0,
    blackout: tuple = (),
    with_depth: bool = False,
    revolutions: float = 1.08,
):
    """Full KITTI-scale closed-loop sequence.

    Returns dict with keys: poses [n,4,4] (Tcw, left camera), left
    (list of [H,W]), and optionally right (baseline > 0) / depth
    (with_depth). Frames whose index is in `blackout` render as flat
    background (tracking must go LOST and relocalize after).
    """
    poses = make_loop_trajectory(n_frames, radius, revolutions)
    landmarks, intens, patches, normals, ref_dist = make_loop_scene(
        rng, n_landmarks, radius
    )
    left, right, depth = [], [], []
    blackset = set(int(b) for b in blackout)
    bg = 16.0
    for i in range(n_frames):
        Tcw = poses[i]
        if i in blackset:
            left.append(np.full((cam.height, cam.width), bg, np.float32))
            if baseline > 0.0:
                right.append(
                    np.full((cam.height, cam.width), bg, np.float32)
                )
            if with_depth:
                depth.append(
                    np.zeros((cam.height, cam.width), np.float32)
                )
            continue
        if with_depth:
            img, d = render_frame(
                cam, Tcw, landmarks, intens, patches=patches,
                normals=normals, ref_dist=ref_dist, return_depth=True,
            )
            depth.append(d)
        else:
            img = render_frame(
                cam, Tcw, landmarks, intens, patches=patches,
                normals=normals, ref_dist=ref_dist,
            )
        left.append(img)
        if baseline > 0.0:
            # right camera: offset by +baseline along the camera x axis
            # (rectified stereo: Tcw_r = T_rl @ Tcw_l with T_rl a pure
            # x-translation of -baseline in camera coords)
            T_rl = np.eye(4, dtype=np.float32)
            T_rl[0, 3] = -baseline
            right.append(
                render_frame(
                    cam, T_rl @ Tcw, landmarks, intens, patches=patches,
                    normals=normals, ref_dist=ref_dist,
                )
            )
    out = {"poses": poses, "left": left}
    if baseline > 0.0:
        out["right"] = right
    if with_depth:
        out["depth"] = depth
    return out


def make_sequence(
    rng: np.random.Generator,
    n_frames: int,
    cam: PinholeCamera | None = None,
    n_landmarks: int = 400,
    step: np.ndarray | None = None,
):
    """A simple lateral-translation trajectory with small rotations.

    Returns (cam, poses [n, 4, 4] Tcw, landmarks [m, 3], images list).
    """
    from orb_slam2_test_tpu.geometry.se3 import se3_exp
    import jax.numpy as jnp

    cam = cam or default_camera()
    landmarks = make_landmarks(rng, n_landmarks)
    intensities = rng.uniform(140.0, 255.0, size=(n_landmarks,)).astype(
        np.float32
    )
    patches = _landmark_patches(n_landmarks)
    if step is None:
        step = np.array([0.15, 0.01, 0.0, 0.001, 0.004, 0.001])

    poses = []
    images = []
    for i in range(n_frames):
        xi = jnp.asarray(step * i, dtype=jnp.float32)
        Tcw = np.asarray(se3_exp(xi))
        poses.append(Tcw)
        images.append(
            render_frame(cam, Tcw, landmarks, intensities, patches=patches)
        )
    return cam, np.stack(poses), landmarks, images


def synthetic_ba_problem(n_cams: int, n_pts: int, obs_per_pt: int,
                         seed: int = 0):
    """KITTI-shaped synthetic bundle problem (no dataset needed):
    cameras along a forward trajectory with gentle yaw, stereo-scale
    points ahead of them, observations projected from perturbed ground
    truth so the LM solver does real work. Used by the dist-BA scaling
    benchmark (examples/dist_ba_scaling.py --synthetic) and the
    multi-chip dryrun (__graft_entry__.dryrun_multichip).

    Returns (BAProblem, PinholeCamera)."""
    from orb_slam2_test_tpu.solvers.ba_core import BAProblem

    rng = np.random.default_rng(seed)
    fx = fy = 718.856
    cx, cy = 607.19, 185.22
    bf = fx * 0.53716
    cam = PinholeCamera(fx=fx, fy=fy, cx=cx, cy=cy,
                        width=1241, height=376, bf=bf)

    t = np.arange(n_cams, dtype=np.float64)
    yaw = 0.002 * t
    cw = np.stack([np.cumsum(np.sin(yaw)), np.zeros(n_cams),
                   np.cumsum(np.cos(yaw))], axis=1)  # camera centers
    Tcw_gt = np.tile(np.eye(4), (n_cams, 1, 1))
    for i in range(n_cams):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        Tcw_gt[i, :3, :3] = R
        Tcw_gt[i, :3, 3] = -R @ cw[i]

    anchor = rng.integers(0, n_cams, size=n_pts)
    X = cw[anchor] + rng.normal(0, 1, (n_pts, 3)) * [8, 2, 0] + \
        np.stack([np.sin(yaw[anchor]), np.zeros(n_pts),
                  np.cos(yaw[anchor])], 1) * rng.uniform(5, 40, (n_pts, 1))

    oc = (anchor[:, None] + np.arange(obs_per_pt)[None, :]) % n_cams
    op = np.broadcast_to(np.arange(n_pts)[:, None], oc.shape)
    oc, op = oc.ravel(), op.ravel().copy()
    Xc = np.einsum("oij,oj->oi", Tcw_gt[oc, :3, :3], X[op]) \
        + Tcw_gt[oc, :3, 3]
    z = np.maximum(Xc[:, 2], 0.5)
    u = fx * Xc[:, 0] / z + cx + rng.normal(0, 0.5, len(oc))
    v = fy * Xc[:, 1] / z + cy + rng.normal(0, 0.5, len(oc))
    ur = u - bf / z + rng.normal(0, 0.5, len(oc))
    valid = (Xc[:, 2] > 0.5) & (np.abs(u - cx) < 900) \
        & (np.abs(v - cy) < 300)

    Tcw0 = Tcw_gt.copy()
    Tcw0[:, :3, 3] += rng.normal(0, 0.05, (n_cams, 3))
    X0 = X + rng.normal(0, 0.05, X.shape)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True

    prob = BAProblem(
        cam_Tcw=Tcw0.astype(np.float32),
        cam_fixed=fixed,
        pt_xyz=X0.astype(np.float32),
        pt_valid=np.ones(n_pts, bool),
        obs_cam=oc.astype(np.int32),
        obs_pt=op.astype(np.int32),
        obs_uvr=np.stack([u, v, ur], 1).astype(np.float32),
        obs_isig2=np.ones(len(oc), np.float32),
        obs_valid=valid,
    )
    return prob, cam
