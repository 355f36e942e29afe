"""StageProfiler (SURVEY.md §5.1 — observability layer the reference
lacks; its only timing is vTimesTrack in the example mains)."""

import time

import numpy as np

from orb_slam2_test_tpu.utils.profiling import StageProfiler


def test_disabled_is_noop():
    p = StageProfiler(enabled=False)
    with p.span("x"):
        pass
    assert p.report() == {}


def test_span_accumulates():
    p = StageProfiler(enabled=True)
    for _ in range(5):
        with p.span("a"):
            time.sleep(0.002)
    with p.span("b"):
        time.sleep(0.001)
    r = p.report()
    assert r["a"]["count"] == 5 and r["b"]["count"] == 1
    assert r["a"]["total_s"] >= 0.01
    assert r["a"]["median_s"] >= 0.002
    # sorted by total desc
    assert list(r.keys())[0] == "a"
    txt = p.format_report()
    assert "a" in txt and "median" in txt


def test_add_and_clear():
    p = StageProfiler(enabled=True)
    p.add("k", 1.0)
    p.add("k", 3.0)
    r = p.report()["k"]
    assert r["count"] == 2 and abs(r["mean_s"] - 2.0) < 1e-12
    p.clear()
    assert p.report() == {}


def test_tracker_stages_recorded():
    """End-to-end: spans fire inside the Tracker when enabled."""
    from orb_slam2_test_tpu.utils.profiling import profiler
    from orb_slam2_test_tpu.utils.synthetic import (
        default_camera,
        make_sequence,
    )
    from orb_slam2_test_tpu.engine.tracking import Tracker, TrackerConfig

    rng = np.random.default_rng(0)
    cam = default_camera(320, 240)
    cam, poses, lms, images = make_sequence(
        rng, 3, cam=cam, n_landmarks=80,
        step=np.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0]),
    )
    profiler.enable()
    profiler.clear()
    try:
        tr = Tracker(cam, TrackerConfig(n_features=200, max_keyframes=8,
                                        max_points=1024))
        for i, im in enumerate(images):
            tr.process_image_mono(im, 0.1 * i)
        rep = profiler.report()
        assert rep.get("frame_build", {}).get("count", 0) == 3
    finally:
        profiler.disable()
        profiler.clear()
