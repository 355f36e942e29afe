"""Live RGB-D driver (reference Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc:
ApproximateTime sync over /camera/rgb/image_raw +
/camera/depth_registered/image_raw -> TrackRGBD).

Depth frames are uint16 in the producer's units; --depth-map-factor
converts to meters (5000 for TUM-style producers).

Usage:
  python examples/live_rgbd.py settings.yaml \
      --spool /tmp/cam_rgb --spool2 /tmp/cam_depth
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _live_runner import live_parser, make_source, run_live
from orb_slam2_test_tpu.io.live import ApproximateTimeSync
from orb_slam2_test_tpu.system import System, RGBD


def main():
    args = live_parser(__doc__).parse_args()
    system = System(args.settings, RGBD, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    sync = ApproximateTimeSync(
        make_source(args), make_source(args, second=True),
        slop=args.sync_slop,
    )
    return run_live(system, sync, "rgbd", args)


if __name__ == "__main__":
    raise SystemExit(main())
