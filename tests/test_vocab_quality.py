"""Vocabulary artifact quality (VERDICT round-1 item 4: the shipped
vocabulary must be a real place-recognition artifact — trained on a
large corpus, with healthy leaf occupancy/IDF statistics and high
held-out revisit retrieval — like DBoW2's offline-trained files)."""

import numpy as np
import jax.numpy as jnp
import pytest

from plslam_tpu.config import SlamConfig
from plslam_tpu.core.camera import StereoCamera
from plslam_tpu.io import synthetic
from plslam_tpu.io.synthetic import Degradation
from plslam_tpu.loop import vocabulary as V

CFG = SlamConfig().with_updates({
    "camera": {"width": 512, "height": 320, "fx": 400.0, "fy": 400.0,
               "cx": 256.0, "cy": 160.0, "baseline": 0.3},
    "points": {"max_kpts": 512, "orb_nlevels": 3}})
CAM = StereoCamera.from_config(CFG.camera)


def test_artifact_idf_spread():
    """A corpus-trained vocabulary has discriminative IDF statistics:
    few starving leaves and a real spread of weights. (idf alone cannot
    separate count-0 from count-1 leaves — log(n/max(c,1)) — so the
    max-idf bucket counts empty OR singleton leaves; training-time logs
    recorded 0.0% / 0.5% truly empty. The retrieval test below is the
    functional check.)"""
    voc = V.default_vocabulary("orb")
    idf = np.asarray(voc.idf)
    starving = float(np.mean(idf >= idf.max() - 1e-6))
    assert starving < 0.20, f"{starving*100:.1f}% empty/singleton leaves"
    assert idf.max() - idf.min() > 1.0, "no IDF spread"
    vl = V.default_vocabulary("lbd")
    idf_l = np.asarray(vl.idf)
    assert float(np.mean(idf_l >= idf_l.max() - 1e-6)) < 0.20


@pytest.mark.slow
def test_heldout_revisit_retrieval():
    """>95% top-1 retrieval on held-out revisits: for each of N unseen
    scenes, a second view of the same place must retrieve the first view
    over all other scenes' views."""
    from plslam_tpu.frontend.stereo_points import detect_and_describe
    voc = V.default_vocabulary("orb")
    n_scenes = 20
    visits, revisits = [], []
    for s in range(n_scenes):
        # seeds disjoint from the training corpus (>= 5000)
        seq = synthetic.make_sequence(
            CAM, n_frames=6, seed=5000 + s, n_points=250, n_lines=40,
            step=0.25, degrade=Degradation(texture=0.06, noise=0.012))
        for frame, store in ((0, visits), (5, revisits)):
            img = jnp.asarray(seq.images_l[frame])
            _, desc, _, _, _, valid = detect_and_describe(img, CFG)
            store.append(V.bow_vector(voc, desc, valid))
    db = jnp.stack(visits)                       # (N, D)
    hits = 0
    for s, q in enumerate(revisits):
        scores = np.asarray(V.l1_score(db, q[None, :]))
        hits += int(np.argmax(scores) == s)
    assert hits >= 0.95 * n_scenes, f"top-1 {hits}/{n_scenes}"
