"""TUM RGB-D monocular driver (reference Examples/Monocular/mono_tum.cc).

Usage: python examples/mono_tum.py TUM1.yaml /data/rgbd_dataset_freiburg1_xyz \
           [--vocabulary ORBvoc.txt] [--groundtruth groundtruth.txt]
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _runner import common_parser, run
from orb_slam2_test_tpu.system import System, MONOCULAR
from orb_slam2_test_tpu.io.datasets import load_tum_mono


def main():
    args = common_parser(__doc__).parse_args()
    seq = load_tum_mono(args.sequence)
    system = System(args.settings, MONOCULAR, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    return run(system, seq, args)


if __name__ == "__main__":
    raise SystemExit(main())
