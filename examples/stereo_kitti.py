"""KITTI odometry stereo driver (reference Examples/Stereo/stereo_kitti.cc).

Usage: python examples/stereo_kitti.py KITTI00-02.yaml /data/kitti/sequences/00 \
           --kitti-traj
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _runner import common_parser, run
from orb_slam2_test_tpu.system import System, STEREO
from orb_slam2_test_tpu.io.datasets import load_kitti


def main():
    args = common_parser(__doc__).parse_args()
    seq = load_kitti(args.sequence, stereo=True)
    system = System(args.settings, STEREO, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    return run(system, seq, args)


if __name__ == "__main__":
    raise SystemExit(main())
