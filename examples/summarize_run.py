"""Summarize a driver run (run.log + diag JSONL) into summary.json.

  python examples/summarize_run.py runs/kitti00_full [--notes "..."]

Extracts: frames tracked/lost, keyframes, loops, relocs, ATE, capacity
growth events (from the diag's cap_kf/cap_pt columns), and a per-frame
tracking-health timeline (motion-match counts over time) so "per-frame
time flat / tracking stable over the run" is checkable from the
artifact alone.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir")
    p.add_argument("--notes", default="")
    args = p.parse_args()

    log_p = os.path.join(args.run_dir, "run.log")
    diag_p = os.path.join(args.run_dir, "diag.jsonl")
    out = {"notes": args.notes}

    log = open(log_p, errors="replace").read() if os.path.exists(log_p) else ""
    for pat, key, cast in (
        (r"median tracking time: ([\d.]+) ms", "median_track_ms", float),
        (r"mean tracking time:\s+([\d.]+) ms", "mean_track_ms", float),
        (r"wall time:\s+([\d.]+) s", "wall_s", float),
        (r"keyframes: (\d+)", "keyframes", int),
        (r"loops: (\d+)", "loops", int),
        (r"relocs: (\d+)", "relocs", int),
        (r"lost frames: (\d+)", "lost_frames", int),
        (r"ATE RMSE: ([\d.]+) m over (\d+) pairs", "ate_rmse_m", float),
    ):
        mm = re.search(pat, log)
        if mm:
            out[key] = cast(mm.group(1))
    mm = re.search(r"ATE RMSE: [\d.]+ m over (\d+) pairs", log)
    if mm:
        out["ate_pairs"] = int(mm.group(1))

    if os.path.exists(diag_p):
        rows = [json.loads(x) for x in open(diag_p)]
        out["frames"] = len(rows)
        out["frames_ok"] = sum(1 for r in rows if r["state"] == "OK")
        out["pct_ok"] = round(100.0 * out["frames_ok"] / max(len(rows), 1), 1)
        # capacity growth events
        growth = []
        prev = None
        for r in rows:
            cap = (r.get("cap_kf"), r.get("cap_pt"))
            if prev is not None and cap != prev:
                growth.append({"frame": r["frame"], "cap_kf": cap[0],
                               "cap_pt": cap[1]})
            prev = cap
        out["capacity_growth_events"] = growth
        # tracking-health timeline: median motion matches per 10% chunk
        import numpy as np

        mm_series = [
            r.get("n_motion_matches") for r in rows
            if r.get("n_motion_matches") is not None
        ]
        if mm_series:
            chunks = np.array_split(np.asarray(mm_series, float), 10)
            out["motion_matches_p50_by_decile"] = [
                round(float(np.median(c)), 1) for c in chunks if len(c)
            ]
        kf_series = [r["n_kf"] for r in rows]
        if kf_series:
            out["keyframes_final"] = int(kf_series[-1])

    dst = os.path.join(args.run_dir, "summary.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"written to {dst}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
