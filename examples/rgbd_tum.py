"""TUM RGB-D driver (reference Examples/RGB-D/rgbd_tum.cc).

Usage: python examples/rgbd_tum.py TUM1.yaml /data/rgbd_dataset_freiburg1_desk \
           [--associations associations.txt] [--vocabulary ORBvoc.txt]
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _runner import common_parser, run
from orb_slam2_test_tpu.system import System, RGBD
from orb_slam2_test_tpu.io.datasets import load_tum_rgbd


def main():
    p = common_parser(__doc__)
    p.add_argument("--associations", default=None)
    args = p.parse_args()
    system = System(args.settings, RGBD, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    seq = load_tum_rgbd(
        args.sequence,
        depth_map_factor=float(system.settings.depth_map_factor or 5000.0),
        associations=args.associations,
    )
    return run(system, seq, args)


if __name__ == "__main__":
    raise SystemExit(main())
