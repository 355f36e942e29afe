"""Viewer: headless periodic snapshot thread-equivalent (reference
src/Viewer.cc runs a Pangolin render loop in its own thread; here
update() is called per frame and writes map/frame snapshots every
`every` frames — no display server needed on a TPU host)."""

from __future__ import annotations

import os

import numpy as np


class Viewer:
    def __init__(self, system, out_dir: str = "viewer_out", every: int = 30):
        self.system = system
        self.out_dir = out_dir
        self.every = every
        self.counter = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self):
        self.counter += 1
        if self.counter % self.every:
            return
        self.snapshot(tag=f"{self.counter:06d}")

    def snapshot(self, tag: str = "final"):
        from orb_slam2_test_tpu.viz.map_drawer import draw_map
        from orb_slam2_test_tpu.viz.frame_drawer import draw_tracker_frame

        tr = self.system.tracker
        draw_map(
            tr.map,
            trajectory=tr.trajectory,
            path=os.path.join(self.out_dir, f"map_{tag}.png"),
        )
        frame = draw_tracker_frame(tr)
        if frame is not None:
            import cv2

            cv2.imwrite(
                os.path.join(self.out_dir, f"frame_{tag}.png"), frame
            )

    def close(self):
        self.snapshot(tag="final")
