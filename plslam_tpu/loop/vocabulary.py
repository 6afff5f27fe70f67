"""Binary bag-of-words vocabulary (DBoW2 equivalent).

Reference parity: pl-slam ``3rdparty/DBoW2`` —
``TemplatedVocabulary<FORB>``: a k^L tree of binary centroids built by
hierarchical k-majority (k-means over bits), TF-IDF weighted leaf
histograms ("BoW vectors"), L1 similarity scoring. PL-SLAM keeps TWO
vocabularies (ORB points + LBD lines) and fuses both scores; so do we.

TPU shape: the tree levels live as dense centroid arrays
(level l: (k^l * k, 256)); the transform descends all N descriptors in
lockstep — per level one (N, k) Hamming block via the +-1 matmul trick
and an argmin. BoW vectors are dense (n_leaves,) float32, so database
scoring is a matvec (see loop.database).

Building runs on host numpy (offline, cached to npz) — clustering is a
one-time artifact, exactly like DBoW2's pre-trained vocabulary files.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from plslam_tpu.ops import hamming


class Vocabulary(NamedTuple):
    centroids: tuple          # per level l: (k^(l+1), 256) uint8 jnp arrays
    idf: jnp.ndarray          # (n_leaves,) float32
    k: int
    levels: int
    origin: str = ""          # stable identity for program caches: the
                              # artifact path (+ size/mtime) or a build
                              # descriptor — NOT object id(), which a
                              # GC'd-and-reallocated Vocabulary can alias

    @property
    def n_leaves(self) -> int:
        return self.k ** self.levels


# ---------------- building (host, numpy) ------------------------------------

def _kmajority(desc: np.ndarray, k: int, rng, iters: int = 8) -> np.ndarray:
    """Cluster binary descriptors (N, 256) into k bit-majority centroids."""
    n = len(desc)
    if n == 0:
        return rng.integers(0, 2, (k, 256)).astype(np.uint8)
    centroids = desc[rng.choice(n, size=min(k, n), replace=False)].astype(np.uint8)
    if len(centroids) < k:
        centroids = np.concatenate(
            [centroids, rng.integers(0, 2, (k - len(centroids), 256))]).astype(np.uint8)
    for _ in range(iters):
        d = (desc[:, None, :] != centroids[None, :, :]).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            members = desc[assign == c]
            if len(members):
                centroids[c] = (members.mean(0) > 0.5).astype(np.uint8)
    return centroids


def build_vocabulary(descriptors: np.ndarray, k: int = 8, levels: int = 4,
                     seed: int = 0, weights_from: Optional[np.ndarray] = None
                     ) -> Vocabulary:
    """Hierarchical k-majority build (TemplatedVocabulary::create parity).

    descriptors: (N, 256) uint8 bits. weights_from: descriptor set used
    for IDF statistics (defaults to the training set).
    """
    rng = np.random.default_rng(seed)
    levels_arr = []
    groups = [descriptors]
    for l in range(levels):
        cents = np.zeros((k ** (l + 1), 256), np.uint8)
        next_groups = []
        for gi, g in enumerate(groups):
            c = _kmajority(g, k, rng)
            cents[gi * k:(gi + 1) * k] = c
            if len(g):
                d = (g[:, None, :] != c[None, :, :]).sum(-1)
                assign = d.argmin(1)
            else:
                assign = np.zeros((0,), int)
            for ci in range(k):
                next_groups.append(g[assign == ci] if len(g) else g)
        groups = next_groups
        levels_arr.append(jnp.asarray(cents))

    import zlib
    digest = zlib.crc32(np.ascontiguousarray(
        np.concatenate([np.asarray(c).reshape(-1) for c in levels_arr])
    ).tobytes())
    voc = Vocabulary(centroids=tuple(levels_arr),
                     idf=jnp.ones((k ** levels,), jnp.float32),
                     k=k, levels=levels,
                     origin=f"built:{k}:{levels}:{seed}:{digest:08x}")
    w = weights_from if weights_from is not None else descriptors
    if len(w):
        leaves = np.asarray(transform_leaves(voc, jnp.asarray(w)))
        counts = np.bincount(leaves, minlength=k ** levels).astype(np.float64)
        n = max(len(w), 1)
        idf = np.log(n / np.maximum(counts, 1.0))
        voc = voc._replace(idf=jnp.asarray(idf, jnp.float32))
    return voc


def save_vocabulary(voc: Vocabulary, path: str) -> None:
    np.savez_compressed(
        path, k=voc.k, levels=voc.levels, idf=np.asarray(voc.idf),
        **{f"level_{i}": np.asarray(c) for i, c in enumerate(voc.centroids)})


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    k, levels = int(z["k"]), int(z["levels"])
    cents = tuple(jnp.asarray(z[f"level_{i}"]) for i in range(levels))
    st = os.stat(path)
    origin = f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}"
    return Vocabulary(centroids=cents, idf=jnp.asarray(z["idf"]),
                      k=k, levels=levels, origin=origin)


# ---------------- transform (device, jittable) ------------------------------

def transform_leaves(voc: Vocabulary, desc_bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) descriptors -> (N,) leaf ids by lockstep tree descent."""
    n = desc_bits.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    d_pm = hamming.bits_to_pm1(desc_bits)              # (N, 256) bf16
    for l in range(voc.levels):
        cents = voc.centroids[l]                       # (k^(l+1), 256)
        child_ids = node[:, None] * voc.k + jnp.arange(voc.k)[None, :]
        c_bits = cents[child_ids]                      # (N, k, 256)
        c_pm = hamming.bits_to_pm1(c_bits)
        sim = jnp.einsum("n b, n k b -> n k", d_pm.astype(jnp.float32),
                         c_pm.astype(jnp.float32))
        node = child_ids[jnp.arange(n), jnp.argmax(sim, axis=-1)]
    return node


def bow_vector(voc: Vocabulary, desc_bits: jnp.ndarray,
               valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """TF-IDF L1-normalized BoW vector (n_leaves,)."""
    leaves = transform_leaves(voc, desc_bits)
    w = jnp.ones((desc_bits.shape[0],), jnp.float32)
    if valid is not None:
        w = jnp.where(valid, w, 0.0)
    hist = jnp.zeros((voc.n_leaves,), jnp.float32).at[leaves].add(w)
    v = hist * voc.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def l1_score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: 1 - 0.5 * |v1 - v2|_1 in [0, 1].

    Broadcasts: v1 (..., D), v2 (..., D).
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


# ---------------- default artifact ------------------------------------------

_DEFAULT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "vocab_default.npz")


_VOCAB_VERSION = 2   # v2: corpus-trained (see build_default_corpus)


def default_vocabulary(kind: str = "orb", k: int = 10, levels: int = 4
                       ) -> Vocabulary:
    """Load (or build + cache) the default vocabulary — the stand-in for
    DBoW2's downloadable vocabulary files. The shipped v2 artifact is
    trained offline on a large randomized textured synthetic corpus
    (see ``build_default_corpus`` / tools/train_vocabulary.py), exactly
    as DBoW2's vocabularies are trained offline on image corpora."""
    path = _DEFAULT_PATH.replace(
        ".npz", f"_{kind}_{k}_{levels}_v{_VOCAB_VERSION}.npz")
    # process-level cache: every LoopCloser sees the SAME Vocabulary
    # object, so jitted programs closed over it (the fused SLAM step)
    # can be reused across driver instances by object identity
    if path in _VOCAB_CACHE:
        return _VOCAB_CACHE[path]
    if os.path.exists(path):
        voc = load_vocabulary(path)
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        desc = build_default_corpus(kind)
        voc = build_vocabulary(desc, k=k, levels=levels, seed=1)
        save_vocabulary(voc, path)
    _VOCAB_CACHE[path] = voc
    return voc


_VOCAB_CACHE: dict = {}


def build_default_corpus(kind: str, n_scenes: Optional[int] = None,
                         seed0: int = 1000) -> np.ndarray:
    """Training descriptors from ``n_scenes`` randomized synthetic scenes
    (varied densities, textured backdrops, sensor noise, 2 views each) —
    tens of thousands of descriptors per family, so leaf occupancy and
    IDF statistics are meaningful (the round-1 vocabulary trained on 6
    clean scenes left most of the 4096 leaves empty)."""
    from plslam_tpu.config import SlamConfig
    from plslam_tpu.core.camera import StereoCamera
    from plslam_tpu.io import synthetic
    from plslam_tpu.io.synthetic import Degradation

    if n_scenes is None:
        # lines are ~10x sparser per frame than keypoints: more scenes
        # (and line-denser worlds) to reach healthy leaf occupancy
        n_scenes = 120 if kind == "orb" else 400
    cfg = SlamConfig().with_updates({
        "camera": {"width": 640, "height": 384, "fx": 450.0, "fy": 450.0,
                   "cx": 320.0, "cy": 192.0, "baseline": 0.3},
        "points": {"max_kpts": 512, "orb_nlevels": 3}})
    cam = StereoCamera.from_config(cfg.camera)
    # jit the extractor ONCE (static cfg) — unjitted calls execute the
    # graph op-by-op and the per-op executables exhaust compile memory
    # over hundreds of scenes
    import jax
    if kind == "orb":
        from plslam_tpu.frontend.stereo_points import detect_and_describe
        extract = jax.jit(lambda im: detect_and_describe(im, cfg))
    else:
        from plslam_tpu.frontend.stereo_lines import detect_and_describe_lines
        extract = jax.jit(lambda im: detect_and_describe_lines(im, cfg))
    rng = np.random.default_rng(seed0)
    out = []
    for s in range(n_scenes):
        deg = Degradation(texture=float(rng.uniform(0.0, 0.15)),
                          noise=float(rng.uniform(0.002, 0.02)),
                          vignette=float(rng.uniform(0.0, 0.3)))
        seq = synthetic.make_sequence(
            cam, n_frames=2, seed=seed0 + s,
            n_points=int(rng.integers(150, 380)),
            n_lines=int(rng.integers(30, 90)) if kind == "orb"
            else int(rng.integers(70, 128)),
            step=float(rng.uniform(0.1, 0.5)),
            kind="forward" if s % 2 == 0 else "arc",
            degrade=deg)
        for f in range(2):
            img = jnp.asarray(seq.images_l[f])
            if kind == "orb":
                _, desc, _, _, _, valid = extract(img)
                out.append(np.asarray(desc)[np.asarray(valid)])
            else:
                segs, desc = extract(img)
                out.append(np.asarray(desc)[np.asarray(segs.valid)])
    return np.concatenate(out, axis=0)
