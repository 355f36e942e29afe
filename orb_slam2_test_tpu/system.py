"""System: the L5 facade (reference include/System.h, src/System.cc).

One object that wires vocabulary + settings + tracker + loop closing
and exposes the reference's public API surface:

  reference System::                  here:
    System(voc, settings, sensor)  ->  System(settings, sensor, vocabulary=...)
    TrackMonocular(im, t)          ->  track_monocular(img, t)
    TrackStereo(imL, imR, t)       ->  track_stereo(imgL, imgR, t)
    TrackRGBD(im, depth, t)        ->  track_rgbd(img, depth, t)
    ActivateLocalizationMode       ->  activate_localization_mode()
    DeactivateLocalizationMode     ->  deactivate_localization_mode()
    Reset                          ->  reset()
    Shutdown                       ->  shutdown()
    SaveTrajectoryTUM              ->  save_trajectory_tum(path)
    SaveTrajectoryKITTI            ->  save_trajectory_kitti(path)
    SaveKeyFrameTrajectoryTUM      ->  save_keyframe_trajectory_tum(path)
    GetTrackingState               ->  tracking_state
    (absent in reference)          ->  save_checkpoint / load_checkpoint

Architectural difference from the reference (by design, SURVEY.md §7):
the reference runs Tracking / LocalMapping / LoopClosing as 3 pthreads
over a mutexed object map; here each is a jitted stage over one array
MapState, sequenced per keyframe on the host. Dispatch is async (JAX),
so frame N+1's extraction overlaps frame N's device work without
host threads.
"""

from __future__ import annotations

import time
from typing import Optional, Union

import numpy as np

from orb_slam2_test_tpu.engine.tracking import Tracker, TrackingState
from orb_slam2_test_tpu.io.settings import SlamSettings, load_settings
from orb_slam2_test_tpu.io import trajectory as traj_io

MONOCULAR = "monocular"
STEREO = "stereo"
RGBD = "rgbd"

_SENSORS = (MONOCULAR, STEREO, RGBD)


class System:
    """Facade over the full SLAM engine."""

    def __init__(
        self,
        settings: Union[str, SlamSettings],
        sensor: str = MONOCULAR,
        vocabulary=None,
        use_viewer: bool = False,
        viewer_dir: str = "viewer_out",
        live_viewer_port: int | None = None,
        **config_overrides,
    ):
        """settings: path to a reference-format YAML or a SlamSettings.
        vocabulary: path to a DBoW2 text vocabulary, a Vocabulary, or
        None (disables loop closing + BoW relocalization, like running
        the reference without a vocabulary would)."""
        if sensor not in _SENSORS:
            raise ValueError(f"sensor must be one of {_SENSORS}")
        from orb_slam2_test_tpu.utils.cache import (
            enable_persistent_compilation_cache,
        )

        enable_persistent_compilation_cache()
        self.sensor = sensor
        self.settings = (
            load_settings(settings) if isinstance(settings, str) else settings
        )
        # reference NeedNewKeyFrame: thRefRatio = 0.75 for stereo/RGB-D,
        # 0.9 for monocular
        if sensor != MONOCULAR and "kf_ref_ratio" not in config_overrides:
            config_overrides["kf_ref_ratio"] = 0.75
        cfg = self.settings.tracker_config(**config_overrides)
        self.tracker = Tracker(self.settings.camera, cfg)

        self.vocabulary = None
        if vocabulary is not None:
            from orb_slam2_test_tpu.bow.vocabulary import (
                Vocabulary,
                default_vocabulary,
                load_vocabulary,
            )

            if vocabulary == "default":
                # the packaged artifact (reference: System loads
                # Vocabulary/ORBvoc.txt unconditionally, System.cc:~55)
                t0 = time.time()
                try:
                    self.vocabulary = default_vocabulary()
                    print(
                        f"Vocabulary loaded in {time.time() - t0:.2f}s "
                        f"({self.vocabulary.n_words} words)"
                    )
                except FileNotFoundError as e:
                    print(f"WARNING: {e}; running without place "
                          "recognition")
            elif isinstance(vocabulary, str):
                t0 = time.time()
                self.vocabulary = load_vocabulary(vocabulary)
                print(
                    f"Vocabulary loaded in {time.time() - t0:.2f}s "
                    f"({self.vocabulary.n_words} words)"
                )
            else:
                self.vocabulary = vocabulary
            # stereo/RGB-D fixes Sim3 scale (reference: bFixScale =
            # sensor != MONOCULAR in System ctor)
            if self.vocabulary is not None:
                self.tracker.enable_place_recognition(
                    self.vocabulary, fix_scale=(sensor != MONOCULAR)
                )

        self.viewer = None
        if live_viewer_port is not None:
            # live HTTP viewer (reference Viewer thread + Pangolin menu
            # equivalents — see viz/live_viewer.py)
            from orb_slam2_test_tpu.viz.live_viewer import LiveViewer

            self.viewer = LiveViewer(self, port=live_viewer_port)
            print(
                f"live viewer: http://localhost:{self.viewer.port}/"
            )
        elif use_viewer:
            from orb_slam2_test_tpu.viz.viewer import Viewer

            self.viewer = Viewer(self, out_dir=viewer_dir)

        self._frame_times = []  # per-frame wall-clock (reference
        # example mains collect vTimesTrack and print median/mean)

    # ------------------------------------------------------------------
    # Per-frame entry points
    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, timestamp: float):
        if self.sensor != MONOCULAR:
            raise RuntimeError("track_monocular requires sensor=MONOCULAR")
        return self._timed(
            lambda: self.tracker.process_image_mono(img, timestamp)
        )

    def track_stereo(
        self, img_left: np.ndarray, img_right: np.ndarray, timestamp: float
    ):
        if self.sensor != STEREO:
            raise RuntimeError("track_stereo requires sensor=STEREO")
        return self._timed(
            lambda: self.tracker.process_image_stereo(
                img_left, img_right, timestamp
            )
        )

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray, timestamp: float):
        if self.sensor != RGBD:
            raise RuntimeError("track_rgbd requires sensor=RGBD")
        return self._timed(
            lambda: self.tracker.process_image_rgbd(img, depth, timestamp)
        )

    def _timed(self, fn):
        t0 = time.time()
        pose = fn()
        self._frame_times.append(time.time() - t0)
        if self.viewer is not None:
            self.viewer.update()
        return pose

    # ------------------------------------------------------------------
    # Modes / lifecycle
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Track against the frozen map; no new keyframes/points
        (reference ActivateLocalizationMode stops LocalMapping)."""
        self.tracker.drain_backend()  # keyframe pipeline + GBA chunks
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def reset(self):
        self.tracker.reset()
        self._frame_times = []

    def shutdown(self):
        """Flush pending device work and the viewer (the reference
        joins its LocalMapping/LoopClosing/Viewer threads here; our
        deferred keyframe pipeline + async dispatch is drained
        instead)."""
        import jax

        self.tracker.drain_backend()
        for leaf in self.tracker.map:
            try:
                leaf.block_until_ready()
            except AttributeError:
                pass
        if self.viewer is not None:
            self.viewer.close()

    # ------------------------------------------------------------------
    # State / stats
    # ------------------------------------------------------------------
    @property
    def tracking_state(self) -> str:
        return self.tracker.state

    @property
    def is_lost(self) -> bool:
        return self.tracker.state == TrackingState.LOST

    def get_tracked_map_points(self) -> np.ndarray:
        """Indices of map points matched in the current frame."""
        fp = self.tracker.cur_feat_pt
        if fp is None:
            return np.zeros((0,), np.int32)
        fp = np.asarray(fp)
        return fp[fp >= 0]

    def timing_stats(self) -> dict:
        """Median/mean per-frame track time (what the reference's
        example mains print at exit)."""
        if not self._frame_times:
            return {"n": 0}
        ts = np.sort(np.array(self._frame_times))
        return {
            "n": len(ts),
            "median_s": float(np.median(ts)),
            "mean_s": float(ts.mean()),
            "fps_median": float(1.0 / max(np.median(ts), 1e-9)),
        }

    # ------------------------------------------------------------------
    # Export / checkpoint
    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        traj_io.save_trajectory_tum(path, self.tracker.export_trajectory())

    def save_trajectory_kitti(self, path: str):
        traj_io.save_trajectory_kitti(path, self.tracker.export_trajectory())

    def save_keyframe_trajectory_tum(self, path: str):
        traj_io.save_trajectory_tum(
            path, self.tracker.export_keyframe_trajectory()
        )

    def save_checkpoint(self, path: str):
        from orb_slam2_test_tpu.io.checkpoint import save_tracker

        save_tracker(path, self.tracker)

    def load_checkpoint(self, path: str):
        from orb_slam2_test_tpu.io.checkpoint import load_tracker

        load_tracker(path, self.tracker)
