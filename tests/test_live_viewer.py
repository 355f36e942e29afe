"""Live HTTP viewer (viz/live_viewer.py — reference src/Viewer.cc
parity): drives a headless session with the viewer attached, fetches
the page/state/frame endpoints, and exercises the menu controls
(localization mode, pause/resume, reset)."""

import json
import time
import urllib.request

import numpy as np
import pytest

from orb_slam2_test_tpu.io.settings import SlamSettings
from orb_slam2_test_tpu.utils.synthetic import default_camera, make_sequence


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return r.status, r.read()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


@pytest.mark.slow
def test_live_viewer_session(rng):
    from orb_slam2_test_tpu.system import System, MONOCULAR

    cam = default_camera(320, 240)
    n_frames = 10
    cam, poses_gt, landmarks, images = make_sequence(
        rng, n_frames, cam=cam, n_landmarks=160,
        step=np.array([0.12, 0.01, 0.0, 0.001, 0.003, 0.001]),
    )
    settings = SlamSettings(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height,
        n_features=400, max_keyframes=32, max_points=4096,
        local_kf_cap=8, ba_pt_cap=1024, fps=10.0,
    )
    overrides = dict(
        ba_fixed_cap=4, n_triangulate_neighbors=2, min_init_matches=40,
        min_init_triangulated=30, max_frames_between_kf=4,
        min_local_inliers=20,
    )
    sys_ = System(
        settings, sensor=MONOCULAR, live_viewer_port=0, **overrides
    )
    port = sys_.viewer.port
    assert port > 0
    sys_.viewer.every = 2  # refresh frequently for the test

    for i in range(n_frames):
        sys_.track_monocular(images[i], 0.1 * i)
    assert sys_.tracking_state == "OK"

    # page + snapshot endpoints
    status, html = _get(port, "/")
    assert status == 200 and b"Viewer" in html
    status, body = _get(port, "/state.json")
    assert status == 200
    state = json.loads(body)
    assert state["state"] == "OK"
    assert state["n_kf"] >= 2
    assert len(state["kf"]) >= 2
    assert len(state["points"]) > 50
    assert len(state["traj"]) >= 2
    assert state["mode"] == "slam"
    status, jpg = _get(port, "/frame.jpg")
    assert status == 200 and len(jpg) > 100  # real JPEG bytes

    # menu controls: localization mode applies at the next update()
    _post(port, "/control", {"action": "localization_on"})
    sys_.track_monocular(images[-1], 0.1 * n_frames)
    assert sys_.tracker.localization_only
    n_kf_frozen = sys_.tracker.stats["n_kf"]
    sys_.track_monocular(images[-2], 0.1 * n_frames + 0.1)
    assert sys_.tracker.stats["n_kf"] == n_kf_frozen
    _post(port, "/control", {"action": "localization_off"})

    # pause blocks update() until resume (exercised from the server
    # thread by scheduling the resume before tracking the next frame)
    _post(port, "/control", {"action": "pause"})
    import threading

    def _resume():
        time.sleep(0.3)
        _post(port, "/control", {"action": "resume"})

    t = threading.Thread(target=_resume)
    t.start()
    t0 = time.time()
    sys_.track_monocular(images[-1], 0.1 * n_frames + 0.2)
    t.join()
    assert time.time() - t0 >= 0.25  # actually waited for resume

    # reset clears the map through the viewer control path
    _post(port, "/control", {"action": "reset"})
    sys_.track_monocular(images[0], 99.0)
    assert sys_.tracker.stats["n_kf"] == 0  # re-initializing

    sys_.shutdown()
    assert not sys_.viewer._thread.is_alive()
