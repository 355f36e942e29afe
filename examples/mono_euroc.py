"""EuRoC MAV monocular driver (reference Examples/Monocular/mono_euroc.cc).

Usage: python examples/mono_euroc.py EuRoC.yaml /data/MH_01_easy \
           [--timestamps MH01.txt]
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _runner import common_parser, run
from orb_slam2_test_tpu.system import System, MONOCULAR
from orb_slam2_test_tpu.io.datasets import load_euroc


def main():
    p = common_parser(__doc__)
    p.add_argument("--timestamps", default=None)
    args = p.parse_args()
    seq = load_euroc(args.sequence, stereo=False,
                     timestamps_file=args.timestamps)
    system = System(args.settings, MONOCULAR, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    return run(system, seq, args)


if __name__ == "__main__":
    raise SystemExit(main())
