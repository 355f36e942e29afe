"""Place-recognition recall of a vocabulary on a revisit sequence.

VERDICT round-2 gap: the shipped vocabulary's discriminative power at
hundreds of keyframes was unproven. This tool measures it directly on a
loop dataset (e.g. the synthetic KITTI 00): frames [0, split) become a
pseudo-keyframe database; frames [split, end) — the loop's revisit
overlap — query it. A query is a HIT when one of its top-5 candidates
lies within `--radius` meters of the query's true (ground-truth)
position. Reports top-1/top-5 recall per vocabulary.

  python examples/vocab_recall.py /root/synthdata/kitti00 \
      --vocab orb_slam2_test_tpu/data/vocab_k10_L5.npz \
      --vocab orb_slam2_test_tpu/data/vocab_k10_L6.npz \
      --split 500 --out runs/vocab_recall.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", help="KITTI-format sequence dir with groundtruth.txt")
    p.add_argument("--vocab", action="append", required=True)
    p.add_argument("--split", type=int, default=500)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--radius", type=float, default=8.0)
    p.add_argument("--n-features", type=int, default=2000)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from orb_slam2_test_tpu.bow.vocabulary import load_vocabulary, transform
    from orb_slam2_test_tpu.engine.frame import build_frame_mono
    from orb_slam2_test_tpu.geometry.camera import PinholeCamera
    from orb_slam2_test_tpu.io.datasets import load_kitti
    from orb_slam2_test_tpu.io.settings import load_settings
    from orb_slam2_test_tpu.io.trajectory import load_trajectory_tum
    from orb_slam2_test_tpu.slam_map.keyframe_db import (
        KeyFrameDatabase,
        bow_vector,
    )

    st = load_settings(os.path.join(args.dataset, "settings.yaml"))
    cam = st.camera
    seq = load_kitti(args.dataset, stereo=False)
    gt = load_trajectory_tum(os.path.join(args.dataset, "groundtruth.txt"))
    centers = {}
    for ts, T in gt:
        R, t = T[:3, :3], T[:3, 3]
        centers[round(float(ts), 4)] = -R.T @ t

    n = len(seq)
    idx_all = list(range(0, n, args.stride))
    db_idx = [i for i in idx_all if i < args.split]
    q_idx = [i for i in idx_all if i >= args.split]
    print(f"{len(db_idx)} database frames, {len(q_idx)} queries")

    # extract descriptors once (shared across vocabularies)
    descs = {}
    pos = {}
    for j, i in enumerate(idx_all):
        it = seq.items[i]
        data = seq.load(it)
        f = build_frame_mono(
            jnp.asarray(data[1]), data[0], cam,
            n_features=args.n_features,
        )
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        descs[i] = d
        pos[i] = centers[round(float(data[0]), 4)]
        if (j + 1) % 50 == 0:
            print(f"  extracted {j + 1}/{len(idx_all)}", flush=True)

    report = {"dataset": args.dataset, "split": args.split,
              "radius_m": args.radius, "n_db": len(db_idx),
              "n_queries": len(q_idx), "vocabs": {}}
    for vpath in args.vocab:
        voc = load_vocabulary(vpath)
        db = KeyFrameDatabase(voc.word_weight)
        words = {}
        for i in idx_all:
            w, _ = transform(
                voc, jnp.asarray(descs[i]),
                jnp.ones(len(descs[i]), bool),
            )
            words[i] = np.asarray(w)
        for i in db_idx:
            db.add(i, words[i])

        top1 = top5 = 0
        gap_hits = []
        for q in q_idx:
            cands = db.detect_reloc_candidates(words[q])[:5]
            good = [
                c for c in cands
                if np.linalg.norm(pos[c] - pos[q]) <= args.radius
            ]
            if cands and cands[0] in good:
                top1 += 1
            if good:
                top5 += 1
            gap_hits.append(len(good))
        r = {
            "n_words": int(voc.n_words),
            "top1_recall": round(top1 / max(len(q_idx), 1), 4),
            "top5_recall": round(top5 / max(len(q_idx), 1), 4),
        }
        report["vocabs"][os.path.basename(vpath)] = r
        print(f"{vpath}: {r}")

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
