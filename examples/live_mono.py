"""Live monocular driver (reference Examples/ROS/ORB_SLAM2/src/
ros_mono.cc: subscribe to /camera/image_raw, feed TrackMonocular from
the callback).

No ROS here: frames arrive either from a spool directory an external
camera process writes into, or over a TCP socket in SocketSource's
wire format.

Usage:
  python examples/live_mono.py settings.yaml --spool /tmp/cam0 \
      [--vocabulary ORBvoc.txt]
  python examples/live_mono.py settings.yaml --port 7071
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _live_runner import live_parser, make_source, run_live
from orb_slam2_test_tpu.system import System, MONOCULAR


def main():
    args = live_parser(__doc__).parse_args()
    system = System(args.settings, MONOCULAR, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    src = make_source(args)
    return run_live(system, src, "mono", args)


if __name__ == "__main__":
    raise SystemExit(main())
