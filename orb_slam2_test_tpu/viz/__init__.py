"""Visualization (reference: Viewer/FrameDrawer/MapDrawer over Pangolin
GL, src/Viewer.cc / FrameDrawer.cc / MapDrawer.cc).

TPU pods have no display: this is a headless renderer. FrameDrawer
overlays tracked keypoints + state text on the current frame;
MapDrawer renders the map (points, keyframes, covisibility graph,
trajectory) top-down / 3D via matplotlib; Viewer snapshots both to a
directory at a configurable cadence so a run can be monitored by
tailing images (or turned into a video after the fact).
"""

from orb_slam2_test_tpu.viz.frame_drawer import draw_frame  # noqa: F401
from orb_slam2_test_tpu.viz.map_drawer import draw_map  # noqa: F401
from orb_slam2_test_tpu.viz.viewer import Viewer  # noqa: F401
