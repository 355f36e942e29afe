"""Live stereo driver (reference Examples/ROS/ORB_SLAM2/src/
ros_stereo.cc: message_filters ApproximateTime sync over
/camera/left/image_raw + /camera/right/image_raw -> TrackStereo).

Usage:
  python examples/live_stereo.py settings.yaml \
      --spool /tmp/cam_left --spool2 /tmp/cam_right
  python examples/live_stereo.py settings.yaml --port 7071 --port2 7072
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _live_runner import live_parser, make_source, run_live
from orb_slam2_test_tpu.io.live import ApproximateTimeSync
from orb_slam2_test_tpu.system import System, STEREO


def main():
    args = live_parser(__doc__).parse_args()
    system = System(args.settings, STEREO, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    sync = ApproximateTimeSync(
        make_source(args), make_source(args, second=True),
        slop=args.sync_slop,
    )
    return run_live(system, sync, "stereo", args)


if __name__ == "__main__":
    raise SystemExit(main())
