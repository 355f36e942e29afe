"""EuRoC MAV stereo driver with rectification (reference
Examples/Stereo/stereo_euroc.cc: cv::initUndistortRectifyMap from the
LEFT.*/RIGHT.* settings blocks, remap every frame).

Usage: python examples/stereo_euroc.py EuRoC.yaml /data/MH_01_easy \
           [--timestamps MH01.txt]
"""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))

from _runner import common_parser
from orb_slam2_test_tpu.system import System, STEREO
from orb_slam2_test_tpu.io.datasets import load_euroc, StereoRectifier


def main():
    p = common_parser(__doc__)
    p.add_argument("--timestamps", default=None)
    args = p.parse_args()
    seq = load_euroc(args.sequence, stereo=True,
                     timestamps_file=args.timestamps)
    system = System(args.settings, STEREO, vocabulary=args.vocabulary,
                    use_viewer=args.viewer,
                    live_viewer_port=args.live_viewer)
    if system.settings.rectification is None:
        raise SystemExit("settings file has no LEFT.*/RIGHT.* blocks")
    rectify = StereoRectifier(system.settings.rectification)

    # rectified variant of the shared loop
    import _runner

    orig_load = seq.load

    def load_rectified(it):
        t, l, r = orig_load(it)
        lr, rr = rectify(l, r)
        return t, lr, rr

    seq.load = load_rectified
    return _runner.run(system, seq, args)


if __name__ == "__main__":
    raise SystemExit(main())
