"""Offline vocabulary training (DBoW2 TemplatedVocabulary::create parity:
vocabularies are trained offline on an image corpus and shipped as
artifacts). Trains both families on the randomized textured synthetic
corpus and writes plslam_tpu/data/vocab_default_{orb,lbd}_8_4_v2.npz.

Run on CPU: python tools/train_vocabulary.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from plslam_tpu.loop import vocabulary as V


def main(k: int = 10, levels: int = 4):
    for kind in ("orb", "lbd"):
        t0 = time.time()
        desc = V.build_default_corpus(kind)
        print(f"{kind}: corpus {desc.shape[0]} descriptors "
              f"({time.time()-t0:.0f}s)", flush=True)
        voc = V.build_vocabulary(desc, k=k, levels=levels, seed=1)
        leaves = np.asarray(V.transform_leaves(voc, desc))
        occ = np.bincount(leaves, minlength=voc.n_leaves)
        empty = float(np.mean(occ == 0))
        idf = np.asarray(voc.idf)
        print(f"{kind}: empty leaves {empty*100:.1f}%  "
              f"idf [{idf.min():.2f}, {idf.max():.2f}] "
              f"median {np.median(idf):.2f} ({time.time()-t0:.0f}s)",
              flush=True)
        path = V._DEFAULT_PATH.replace(
            ".npz", f"_{kind}_{k}_{levels}_v{V._VOCAB_VERSION}.npz")
        V.save_vocabulary(voc, path)
        print(f"{kind}: wrote {path}", flush=True)


if __name__ == "__main__":
    main()
