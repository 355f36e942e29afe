"""Native C++ helpers (utils/native.py): build-on-first-use + parity
with the pure-Python fallbacks."""

import numpy as np
import pytest

from orb_slam2_test_tpu.bow.vocabulary import (
    _load_text_vocabulary_py,
    build_vocabulary,
    load_text_vocabulary,
    save_text_vocabulary,
)
from orb_slam2_test_tpu.utils.native import load_native, parse_vocab_text

FIELDS = (
    "node_desc", "node_children", "node_is_leaf", "leaf_word", "word_weight"
)


def test_native_vocab_parser_matches_python(tmp_path, rng):
    descs = rng.integers(0, 2 ** 32, (800, 8), dtype=np.uint32)
    voc = build_vocabulary(descs, k=5, depth=3, seed=0)
    p = str(tmp_path / "voc.txt")
    save_text_vocabulary(voc, p)

    if load_native("vocab_loader") is None:
        pytest.skip("no C++ toolchain in this environment")
    v_c = load_text_vocabulary(p)
    v_py = _load_text_vocabulary_py(p)
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(v_c, f)), np.asarray(getattr(v_py, f)), f
        )
    assert (v_c.k, v_c.depth) == (v_py.k, v_py.depth)
    # and a save -> load -> save roundtrip is stable
    p2 = str(tmp_path / "voc2.txt")
    save_text_vocabulary(v_c, p2)
    assert open(p).read() == open(p2).read()


def test_native_parser_rejects_garbage(tmp_path):
    if load_native("vocab_loader") is None:
        pytest.skip("no C++ toolchain in this environment")
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("10 6 0 0\n0 1 not numbers at all\n")
    assert parse_vocab_text(p) is None
    with open(p, "w") as f:
        f.write("")
    assert parse_vocab_text(p) is None


@pytest.mark.slow
def test_native_parser_reference_scale_roundtrip(tmp_path):
    """DBoW2-text round trip at the reference's vocabulary scale
    (~794k leaf words, ~90 MB of text — Vocabulary/ORBvoc.txt is
    ~145 MB): the shipped L6 artifact serializes to text and the C++
    mmap parser reproduces it exactly."""
    from orb_slam2_test_tpu.bow.vocabulary import default_vocabulary

    if load_native("vocab_loader") is None:
        pytest.skip("no C++ toolchain in this environment")
    voc = default_vocabulary()
    assert voc.n_words >= 500_000
    p = str(tmp_path / "voc_l6.txt")
    save_text_vocabulary(voc, p)
    import os
    import time

    t0 = time.time()
    v_c = load_text_vocabulary(p)
    load_s = time.time() - t0
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(v_c, f)), np.asarray(getattr(voc, f)), f
        )
    # the reference's text parse of ORBvoc.txt takes 10-20 s; the mmap
    # C++ parser must stay well under that at comparable scale
    sz_mb = os.path.getsize(p) / 1e6
    assert load_s < 20.0, f"{sz_mb:.0f} MB parse took {load_s:.1f}s"
