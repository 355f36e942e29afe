"""Hierarchical BoW vocabulary over 256-bit ORB descriptors.

Replaces DBoW2's TemplatedVocabulary<FORB> (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h, ~1600 LoC of pointer-tree
C++). TPU-native redesign:

- The k-ary tree (k branches, L depth levels) is stored as flat arrays:
  node descriptors [n_nodes, 8] uint32 and a children index table
  [n_nodes, k] int32. Leaves carry idf weights.
- transform() — the hot op, run once per frame over ~1000 descriptors —
  is L batched rounds of "Hamming argmin against k children": each
  round gathers the k candidate child descriptors per query ([B, k, 8])
  and reduces with popcount — no per-descriptor tree walking.
- The vocabulary can be BUILT from training descriptors (hierarchical
  binary k-means with majority-vote centroids — what DBoW2's `create`
  does offline) or loaded from the reference's ORBvoc.txt text format
  (loadFromTextFile-compatible parser).

NOTE: the shipped ORBvoc.txt was trained on OpenCV ORB descriptors;
since this framework generates its own BRIEF pattern, production use
trains its own vocabulary (build_vocabulary) from a map/dataset sweep.
The text loader exists for format parity.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Vocabulary:
    """Flat-array vocabulary tree.

    node_desc     [n_nodes, 8] uint32 — node cluster centers
    node_children [n_internal?, k] int32 — children ids (-1 pad); row i
                  valid only for internal nodes
    node_is_leaf  [n_nodes] bool
    leaf_word     [n_nodes] int32 — word id for leaves, -1 otherwise
    word_weight   [n_words] float32 — idf weights
    k, depth      branching factor / levels
    """

    node_desc: np.ndarray
    node_children: np.ndarray
    node_is_leaf: np.ndarray
    leaf_word: np.ndarray
    word_weight: np.ndarray
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return len(self.word_weight)


def _unpack(desc: np.ndarray) -> np.ndarray:
    """[N, 8] uint32 -> [N, 256] uint8 bits (little-endian within word,
    matching ops.brief.pack_bits)."""
    b = np.zeros((len(desc), 256), np.uint8)
    for w in range(8):
        word = desc[:, w]
        for i in range(32):
            b[:, w * 32 + i] = (word >> i) & 1
    return b


def _pack(bits: np.ndarray) -> np.ndarray:
    """[N, 256] bits -> [N, 8] uint32 (matches ops.brief.pack_bits)."""
    out = np.zeros((len(bits), 8), np.uint32)
    for w in range(8):
        for i in range(32):
            out[:, w] |= bits[:, w * 32 + i].astype(np.uint32) << np.uint32(i)
    return out


def _binary_kmeans(
    bits: np.ndarray, k: int, rng: np.random.Generator, iters: int = 8
):
    """k-means on binary vectors with majority-vote centroids.
    Returns (centroids [k', 256], assign [N]) with k' <= k."""
    n = len(bits)
    k = min(k, n)
    sel = rng.choice(n, size=k, replace=False)
    cent = bits[sel].astype(np.uint8)
    fb = bits.astype(np.float32)
    for _ in range(iters):
        # hamming distance via dot products on {0,1}: d = a + c - 2ac
        fc = cent.astype(np.float32)
        cross = fb @ fc.T  # [N, k]
        d = fb.sum(1, keepdims=True) + fc.sum(1)[None, :] - 2.0 * cross
        assign = d.argmin(1)
        new = []
        for c in range(len(cent)):
            m = assign == c
            if not m.any():
                continue
            new.append((fb[m].mean(0) >= 0.5).astype(np.uint8))
        cent = np.stack(new)
    fc = cent.astype(np.float32)
    cross = fb @ fc.T
    d = fb.sum(1, keepdims=True) + fc.sum(1)[None, :] - 2.0 * cross
    return cent, d.argmin(1)


def build_vocabulary(
    train_desc: np.ndarray,  # [N, 8] uint32 training descriptors
    k: int = 10,
    depth: int = 4,
    seed: int = 0,
) -> Vocabulary:
    """Hierarchical binary k-means (DBoW2::create equivalent).

    depth counts levels of internal splits; number of words <= k^depth.
    """
    rng = np.random.default_rng(seed)
    bits = _unpack(np.asarray(train_desc, np.uint32))

    node_desc = [np.zeros(256, np.uint8)]  # root (unused descriptor)
    node_children: list[list[int]] = [[]]
    node_level = [0]
    # recursive split
    stack = [(0, np.arange(len(bits)))]
    while stack:
        nid, idx = stack.pop()
        lvl = node_level[nid]
        if lvl >= depth or len(idx) <= 1:
            continue
        cents, assign = _binary_kmeans(bits[idx], k, rng)
        for c in range(len(cents)):
            cid = len(node_desc)
            node_desc.append(cents[c])
            node_children.append([])
            node_level.append(lvl + 1)
            node_children[nid].append(cid)
            sub = idx[assign == c]
            if lvl + 1 < depth and len(sub) > 1:
                stack.append((cid, sub))

    n_nodes = len(node_desc)
    children = np.full((n_nodes, k), -1, np.int32)
    is_leaf = np.ones(n_nodes, bool)
    for i, ch in enumerate(node_children):
        if ch:
            children[i, : len(ch)] = ch
            is_leaf[i] = False
    is_leaf[0] = False

    leaf_word = np.full(n_nodes, -1, np.int32)
    leaves = np.nonzero(is_leaf)[0]
    leaf_word[leaves] = np.arange(len(leaves), dtype=np.int32)

    voc = Vocabulary(
        node_desc=_pack(np.stack(node_desc)),
        node_children=children,
        node_is_leaf=is_leaf,
        leaf_word=leaf_word,
        word_weight=np.ones(len(leaves), np.float32),
        k=k,
        depth=depth,
    )
    # idf weights from the training set (documents = chunks of ~1000
    # descriptors, approximating per-image document statistics)
    words, _ = transform(voc, jnp.asarray(train_desc),
                         jnp.ones(len(train_desc), bool))
    words = np.asarray(words)
    n_docs = max(len(train_desc) // 1000, 1)
    doc_ids = np.minimum(np.arange(len(train_desc)) // 1000, n_docs - 1)
    n_i = np.zeros(voc.n_words, np.float32)
    for d in range(n_docs):
        uw = np.unique(words[doc_ids == d])
        uw = uw[uw >= 0]
        n_i[uw] += 1.0
    idf = np.log(n_docs / np.maximum(n_i, 1.0)) + 1e-3
    voc.word_weight = idf.astype(np.float32)
    return voc


def transform(
    voc: Vocabulary,
    desc: jax.Array,  # [B, 8] uint32
    valid: jax.Array,  # [B]
    node_level_out: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Batched descriptor -> word lookup.

    Returns (word_ids [B] int32 with -1 for invalid, mid_node [B] —
    the tree node at `node_level_out` levels below the root, the
    FeatureVector grouping node in DBoW2 terms).
    """
    node_desc = jnp.asarray(voc.node_desc)
    node_children = jnp.asarray(voc.node_children)
    leaf_word = jnp.asarray(voc.leaf_word)

    B = desc.shape[0]
    cur = jnp.zeros((B,), jnp.int32)
    mid = jnp.zeros((B,), jnp.int32)
    for lvl in range(voc.depth):
        ch = node_children[cur]  # [B, k]
        ch_safe = jnp.clip(ch, 0)
        cdesc = node_desc[ch_safe]  # [B, k, 8]
        x = jnp.bitwise_xor(cdesc, desc[:, None, :])
        d = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=-1
        )  # [B, k]
        d = jnp.where(ch >= 0, d, 4096)
        nxt = jnp.take_along_axis(
            ch, jnp.argmin(d, axis=-1)[:, None], axis=1
        )[:, 0]
        # stop at leaves (variable-depth branches): keep cur if no child
        has_child = jnp.any(ch >= 0, axis=-1)
        cur = jnp.where(has_child, nxt, cur)
        if lvl + 1 == node_level_out:
            mid = cur
    words = leaf_word[cur]
    words = jnp.where(valid, words, -1)
    return words, jnp.where(valid, mid, -1)


# ---------------------------------------------------------------------------
# Native npz vocabulary format (fast load; the DBoW2 text format below
# exists for parity with the reference's ORBvoc.txt)
# ---------------------------------------------------------------------------


def save_vocabulary_npz(voc: Vocabulary, path: str) -> None:
    """Compact binary vocabulary artifact (loads in ~ms vs the
    reference's 10-20 s ORBvoc.txt parse, System.cc:~55)."""
    np.savez_compressed(
        path,
        node_desc=voc.node_desc,
        node_children=voc.node_children,
        node_is_leaf=voc.node_is_leaf,
        leaf_word=voc.leaf_word,
        word_weight=voc.word_weight,
        k=np.int32(voc.k),
        depth=np.int32(voc.depth),
    )


def load_vocabulary_npz(path: str) -> Vocabulary:
    with np.load(path) as z:
        return Vocabulary(
            node_desc=z["node_desc"],
            node_children=z["node_children"],
            node_is_leaf=z["node_is_leaf"],
            leaf_word=z["leaf_word"],
            word_weight=z["word_weight"],
            k=int(z["k"]),
            depth=int(z["depth"]),
        )


# packaged default artifact (trained by examples/build_vocab.py on a
# synthetic multi-scene sweep with this framework's own BRIEF pattern —
# the reference's ORBvoc.txt is semantically incompatible with it).
# Analog of the reference shipping Vocabulary/ORBvoc.txt.tar.gz: the
# default is the k=10 L=6 tree (~794k leaf words, matching the
# reference's ~1M-word ORBvoc scale); the smaller L5 artifact remains
# packaged for memory-constrained runs.
DEFAULT_VOCABULARY_PATH = os.path.join(
    os.path.dirname(__file__), "..", "data", "vocab_k10_L6.npz"
)


def load_vocabulary(path: str) -> Vocabulary:
    """Load a vocabulary by extension: .npz (native) or DBoW2 text."""
    if path.endswith(".npz"):
        return load_vocabulary_npz(path)
    return load_text_vocabulary(path)


def default_vocabulary() -> Vocabulary:
    """The shipped vocabulary (reference: System loads ORBvoc.txt
    unconditionally at startup). Raises with a pointer to
    examples/build_vocab.py if the artifact is absent."""
    path = os.path.normpath(DEFAULT_VOCABULARY_PATH)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no packaged vocabulary at {path}; train one with "
            "`python examples/build_vocab.py` or pass --no-vocabulary"
        )
    return load_vocabulary_npz(path)


# ---------------------------------------------------------------------------
# DBoW2 text format (ORBvoc.txt): first line "k L scoring weighting";
# then one line per non-root node (in BFS order):
#   parent_id is_leaf d0 d1 ... d31 weight
# with d* the 32 descriptor bytes.
# ---------------------------------------------------------------------------


def save_text_vocabulary(voc: Vocabulary, path: str) -> None:
    bits = _unpack(voc.node_desc)
    byts = np.packbits(
        bits.reshape(len(bits), 32, 8), axis=-1, bitorder="little"
    )[..., 0]  # [n, 32] bytes, little-endian bit order within byte
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.depth} 0 0\n")
        parent = np.zeros(len(voc.node_desc), np.int32)
        for i, ch in enumerate(voc.node_children):
            for c in ch:
                if c >= 0:
                    parent[c] = i
        for nid in range(1, len(voc.node_desc)):
            is_leaf = int(voc.node_is_leaf[nid])
            w = (
                float(voc.word_weight[voc.leaf_word[nid]])
                if is_leaf and voc.leaf_word[nid] >= 0
                else 0.0
            )
            ds = " ".join(str(int(b)) for b in byts[nid])
            f.write(f"{parent[nid]} {is_leaf} {ds} {w}\n")


def load_text_vocabulary(path: str) -> Vocabulary:
    """Parse the DBoW2 text vocabulary format
    (ORBVocabulary::loadFromTextFile equivalent).

    Uses the native C++ parser (native/src/vocab_loader.cc) when the
    toolchain is available — the reference's ORBvoc.txt is ~1.1M lines
    / 145 MB and is its slowest init step; the mmap parser does it in
    ~1 s vs minutes for the line-by-line Python fallback below."""
    from orb_slam2_test_tpu.utils.native import parse_vocab_text

    parsed = parse_vocab_text(path)
    if parsed is not None:
        k, depth, byts, parent, is_leaf, weight = parsed
        n = len(parent)
        # file bytes ARE the packed layout: little-endian bits within
        # byte, little-endian bytes within uint32 (== _pack(_unpack))
        node_desc = np.ascontiguousarray(byts).view(np.uint32)

        # children[p, slot] in file order (stable sort preserves it)
        children = np.full((n, k), -1, np.int32)
        nid = np.arange(1, n, dtype=np.int32)
        p = parent[1:]
        order = np.argsort(p, kind="stable")
        sp, sn = p[order], nid[order]
        group_start = np.searchsorted(sp, sp, side="left")
        slot = np.arange(len(sp)) - group_start
        keep = slot < k
        children[sp[keep], slot[keep]] = sn[keep]

        leaf_word = np.full(n, -1, np.int32)
        leaves = np.nonzero(is_leaf)[0]
        leaf_word[leaves] = np.arange(len(leaves), dtype=np.int32)
        return Vocabulary(
            node_desc=node_desc,
            node_children=children,
            node_is_leaf=is_leaf,
            leaf_word=leaf_word,
            word_weight=weight[leaves].astype(np.float32),
            k=k,
            depth=depth,
        )
    return _load_text_vocabulary_py(path)


def _load_text_vocabulary_py(path: str) -> Vocabulary:
    """Pure-Python fallback parser."""
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, leaf_flags, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaf_flags.append(int(parts[1]))
            descs.append([int(x) for x in parts[2:34]])
            weights.append(float(parts[34]))

    n = len(parents) + 1  # + root
    byts = np.zeros((n, 32), np.uint8)
    byts[1:] = np.asarray(descs, np.uint8)
    bits = np.unpackbits(byts[:, :, None], axis=2, bitorder="little")
    bits = bits.reshape(n, 256)
    node_desc = _pack(bits)

    children = np.full((n, k), -1, np.int32)
    counts = np.zeros(n, np.int32)
    for i, p in enumerate(parents):
        nid = i + 1
        children[p, counts[p]] = nid
        counts[p] += 1
    is_leaf = np.asarray([False] + [bool(x) for x in leaf_flags])
    leaf_word = np.full(n, -1, np.int32)
    leaves = np.nonzero(is_leaf)[0]
    leaf_word[leaves] = np.arange(len(leaves), dtype=np.int32)
    w = np.zeros(len(leaves), np.float32)
    for j, nid in enumerate(leaves):
        w[j] = weights[nid - 1]
    return Vocabulary(
        node_desc=node_desc,
        node_children=children,
        node_is_leaf=is_leaf,
        leaf_word=leaf_word,
        word_weight=w,
        k=k,
        depth=depth,
    )
