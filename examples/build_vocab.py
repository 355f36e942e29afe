"""Train and package the BoW vocabulary.

The reference ships a 1M-word ORB vocabulary (Vocabulary/ORBvoc.txt,
loaded unconditionally in System.cc:~55 — its slowest init step at
10-20 s). That file was trained on OpenCV ORB descriptors and is
semantically incompatible with this framework's generated BRIEF pattern
(ops/brief.py), so the TPU build trains its own:

  python examples/build_vocab.py                    # synthetic sweep
  python examples/build_vocab.py --dataset DIR      # real images

and packages it as `orb_slam2_test_tpu/data/vocab_k10_L5.npz` — the
artifact every example driver loads by default (pass --no-vocabulary
to a driver to run without place recognition). Descriptors come from
the framework's own extractor, so the tree matches the deployed
descriptor distribution exactly — the property that matters for
inverted-index discriminativity.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orb_slam2_test_tpu.bow.vocabulary import (
    DEFAULT_VOCABULARY_PATH,
    build_vocabulary,
    save_text_vocabulary,
    save_vocabulary_npz,
    transform,
)


def _extract(img: np.ndarray, cam, n_features: int) -> np.ndarray:
    """[n, 8] uint32 descriptors of one grayscale image."""
    import jax.numpy as jnp

    from orb_slam2_test_tpu.engine.frame import build_frame_mono

    frame = build_frame_mono(
        jnp.asarray(img, jnp.float32), 0.0, cam, n_features=n_features
    )
    desc = np.asarray(frame.desc)
    valid = np.asarray(frame.valid)
    return desc[valid]


def _synthetic_descriptors(
    n_scenes: int, frames_per_scene: int, n_features: int, seed: int
) -> np.ndarray:
    """Multi-scene synthetic sweep: every scene gets its own landmark
    layout AND its own texture set (make_sequence reuses one texture
    seed — fine for tracking tests, too narrow for a vocabulary)."""
    from orb_slam2_test_tpu.geometry.se3 import se3_exp
    from orb_slam2_test_tpu.utils.synthetic import (
        _landmark_patches,
        default_camera,
        make_landmarks,
        render_frame,
    )
    import jax.numpy as jnp

    cam = default_camera(640, 480)
    out = []
    for scene in range(n_scenes):
        rng = np.random.default_rng(seed + scene)
        n_lm = int(rng.integers(300, 700))
        landmarks = make_landmarks(rng, n_lm)
        intensities = rng.uniform(120.0, 255.0, size=(n_lm,)).astype(
            np.float32
        )
        patches = _landmark_patches(n_lm, seed=1000 + scene)
        step = np.array(
            [
                rng.uniform(0.05, 0.2),
                rng.uniform(-0.05, 0.05),
                rng.uniform(-0.02, 0.02),
                rng.uniform(-0.004, 0.004),
                rng.uniform(-0.006, 0.006),
                rng.uniform(-0.004, 0.004),
            ]
        )
        for i in range(frames_per_scene):
            Tcw = np.asarray(se3_exp(jnp.asarray(step * i, jnp.float32)))
            img = render_frame(
                cam, Tcw, landmarks, intensities, patches=patches
            )
            out.append(_extract(img, cam, n_features))
        print(
            f"scene {scene + 1}/{n_scenes}: "
            f"{sum(len(d) for d in out)} descriptors",
            flush=True,
        )
    return np.concatenate(out, axis=0)


def _dataset_descriptors(
    dataset: str, max_frames: int, n_features: int
) -> np.ndarray:
    """Descriptors from a directory of images (TUM rgb/, KITTI
    image_0/, or any flat image folder)."""
    import cv2

    from orb_slam2_test_tpu.utils.synthetic import default_camera

    exts = ("*.png", "*.jpg", "*.jpeg")
    files: list[str] = []
    for pat in exts:
        files += glob.glob(os.path.join(dataset, pat))
        files += glob.glob(os.path.join(dataset, "*", pat))
    files = sorted(files)
    if not files:
        raise FileNotFoundError(f"no images under {dataset}")
    stride = max(len(files) // max_frames, 1)
    files = files[::stride][:max_frames]
    out = []
    cam = None
    for i, path in enumerate(files):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        if cam is None or cam.width != img.shape[1]:
            cam = default_camera(img.shape[1], img.shape[0])
        out.append(_extract(img.astype(np.float32), cam, n_features))
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{len(files)} frames", flush=True)
    return np.concatenate(out, axis=0)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--out", default=os.path.normpath(DEFAULT_VOCABULARY_PATH)
    )
    p.add_argument("--text-out", default=None,
                   help="also write the DBoW2 text format")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--depth", type=int, default=5)
    p.add_argument("--dataset", default=None,
                   help="image directory (else: synthetic sweep)")
    p.add_argument("--n-scenes", type=int, default=24)
    p.add_argument("--frames-per-scene", type=int, default=8)
    p.add_argument("--max-frames", type=int, default=400)
    p.add_argument("--n-features", type=int, default=1200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="extract on the host CPU (leave the TPU free)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    if args.dataset:
        desc = _dataset_descriptors(
            args.dataset, args.max_frames, args.n_features
        )
    else:
        desc = _synthetic_descriptors(
            args.n_scenes, args.frames_per_scene, args.n_features,
            args.seed,
        )
    print(f"{len(desc)} training descriptors ({time.time() - t0:.1f}s)")

    t0 = time.time()
    voc = build_vocabulary(desc, k=args.k, depth=args.depth,
                           seed=args.seed)
    print(
        f"vocabulary: {voc.n_words} words (k={voc.k}, L={voc.depth}) "
        f"built in {time.time() - t0:.1f}s"
    )

    # sanity: word-id distribution over a held-out re-transform
    import jax.numpy as jnp

    words, _ = transform(
        voc, jnp.asarray(desc[:20000]), jnp.ones(min(len(desc), 20000), bool)
    )
    words = np.asarray(words)
    uniq = len(np.unique(words[words >= 0]))
    print(f"20k training descriptors hit {uniq} distinct words")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_vocabulary_npz(voc, args.out)
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")
    if args.text_out:
        save_text_vocabulary(voc, args.text_out)
        print(f"saved {args.text_out} (DBoW2 text format)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
