"""Live-source layer (reference ROS nodes' transport + ApproximateTime
sync, Examples/ROS/ORB_SLAM2/src/*.cc) and the AR plane/cube overlay
(AR/ViewerAR.cc)."""

import os
import socket
import threading

import numpy as np
import pytest

from orb_slam2_test_tpu.io.live import (
    ApproximateTimeSync,
    DirectorySource,
    FrameSource,
    SocketSource,
    send_end,
    send_frame,
)
from orb_slam2_test_tpu.viz.ar import (
    cube_vertices,
    draw_ar_frame,
    fit_plane_ransac,
)


class ListSource(FrameSource):
    def __init__(self, frames):
        self.frames = list(frames)

    def next_frame(self, timeout: float = 1.0):
        if not self.frames:
            raise StopIteration
        return self.frames.pop(0)


def _img(v):
    return np.full((4, 4), float(v), np.float32)


class TestApproximateTimeSync:
    def test_pairs_by_nearest_timestamp(self):
        a = ListSource([(0.00, _img(0)), (0.10, _img(1)), (0.20, _img(2))])
        b = ListSource([(0.01, _img(10)), (0.11, _img(11)),
                        (0.21, _img(12))])
        sync = ApproximateTimeSync(a, b, slop=0.02)
        pairs = list(sync)
        assert len(pairs) == 3
        for k, (ts, ia, ib) in enumerate(pairs):
            assert ia[0, 0] == k and ib[0, 0] == 10 + k
            assert abs(ts - (0.005 + 0.1 * k)) < 1e-9

    def test_drops_unmatched(self):
        # b misses the middle frame; a's 0.10 must be dropped, not
        # paired with 0.21 (outside slop)
        a = ListSource([(0.00, _img(0)), (0.10, _img(1)), (0.20, _img(2))])
        b = ListSource([(0.01, _img(10)), (0.21, _img(12))])
        sync = ApproximateTimeSync(a, b, slop=0.02)
        pairs = list(sync)
        assert [int(p[1][0, 0]) for p in pairs] == [0, 2]

    def test_empty_streams_stop(self):
        sync = ApproximateTimeSync(ListSource([]), ListSource([]),
                                   slop=0.02)
        assert list(sync) == []


class TestDirectorySource:
    def test_orders_and_stops(self, tmp_path):
        import cv2

        d = str(tmp_path)
        for ts in (2.0, 1.0, 3.0):
            cv2.imwrite(os.path.join(d, f"{ts:.6f}.png"),
                        np.full((4, 4), int(ts), np.uint8))
        open(os.path.join(d, "STOP"), "w").close()
        src = DirectorySource(d, poll_s=0.001)
        got = [(ts, img[0, 0]) for ts, img in src]
        assert [g[0] for g in got] == [1.0, 2.0, 3.0]
        assert [g[1] for g in got] == [1.0, 2.0, 3.0]

    def test_timeout_returns_none(self, tmp_path):
        src = DirectorySource(str(tmp_path), poll_s=0.001)
        assert src.next_frame(timeout=0.05) is None


class TestSocketSource:
    def test_roundtrip_all_encodings(self):
        c, s = socket.socketpair()
        img8 = np.arange(12, dtype=np.uint8).reshape(3, 4)
        img16 = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)

        def produce():
            send_frame(c, 1.5, img8, encoding=0)
            send_frame(c, 2.5, img16, encoding=1)
            send_frame(c, 3.5, img8, encoding=2)
            send_end(c)

        t = threading.Thread(target=produce)
        t.start()
        src = SocketSource(sock=s)
        ts, a = src.next_frame()
        assert ts == 1.5 and np.array_equal(a, img8.astype(np.float32))
        ts, b = src.next_frame()
        assert ts == 2.5 and np.array_equal(b, img16.astype(np.float32))
        ts, cimg = src.next_frame()
        assert ts == 3.5 and np.array_equal(cimg,
                                            img8.astype(np.float32))
        with pytest.raises(StopIteration):
            src.next_frame()
        t.join()
        src.close()
        c.close()


class TestARPlane:
    def test_recovers_plane(self):
        rng = np.random.default_rng(3)
        # ground plane z = 0.5 with noise + 20% outliers
        n = 300
        pts = np.zeros((n, 3))
        pts[:, 0] = rng.uniform(-1, 1, n)
        pts[:, 1] = rng.uniform(-1, 1, n)
        pts[:, 2] = 0.5 + rng.normal(0, 0.002, n)
        out = rng.uniform(-1, 1, (60, 3))
        allp = np.concatenate([pts, out])
        plane = fit_plane_ransac(allp, rng=rng)
        assert plane is not None
        assert abs(abs(plane.normal[2]) - 1.0) < 0.01
        assert plane.n_inliers >= 250
        # anchor sits on the plane
        assert abs(plane.normal @ plane.origin + plane.d) < 1e-6

    def test_too_few_points(self):
        assert fit_plane_ransac(np.zeros((5, 3))) is None

    def test_cube_sits_on_plane(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (100, 3))
        pts[:, 2] = 0.0
        plane = fit_plane_ransac(pts, rng=rng)
        V = cube_vertices(plane, size=0.2)
        # 4 base corners on the plane, 4 top corners 0.2 away
        d = np.abs(V @ plane.normal + plane.d)
        assert np.sum(d < 1e-6) == 4
        assert np.sum(np.abs(d - 0.2) < 1e-6) == 4

    def test_draw_overlay(self):
        from orb_slam2_test_tpu.geometry.camera import PinholeCamera

        cam = PinholeCamera(fx=100, fy=100, cx=32, cy=32, width=64,
                            height=64)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.3, 0.3, (100, 3))
        pts[:, 2] = 1.0  # plane 1m in front of camera
        plane = fit_plane_ransac(pts, rng=rng)
        img = np.zeros((64, 64), np.float32)
        out = draw_ar_frame(img, np.eye(4), cam, plane, cube_size=0.2)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        assert out.sum() > 0  # cube edges drawn
        # no plane -> status text only, still valid image
        out2 = draw_ar_frame(img, np.eye(4), cam, None)
        assert out2.shape == (64, 64, 3)
