"""Offline vocabulary training: ship a pre-trained place-recognition
codebook so loop detection / relocalization never run on a random codebook
(reference: the system loads a pre-trained superpoint_voc.yml BEFORE any
tracking, src/System.cc:117-127, build.sh:35-37 — the repo previously
self-trained only after 8 keyframes existed, leaving the first seconds of
every map scoring against noise).

Corpus: the same textured synthetic scenes the shipped SuperPoint was
trained on (models/superpoint_train.make_textured_batch) — the vocabulary
must partition the DESCRIPTOR DISTRIBUTION THE EXTRACTOR EMITS, so the
corpus matches the extractor's training domain. Spherical k-means on ~100k
unit descriptors -> V=1024 words (DBoW3's branching 10 / depth 3-ish scale
for this descriptor budget; dense scoring needs no tree).

Run:  python -m dani_slam_tpu.models.vocab_train  [--images N] [--words V]
Ships: dani_slam_tpu/weights/superpoint_voc.npz  {codebook [V,256], sha}
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def build_corpus(sp_params, n_images: int = 400, h: int = 240, w: int = 320,
                 n_per: int = 512, seed: int = 0,
                 threshold: float = 0.002):
    """Render textured scenes, extract SuperPoint descriptors, return the
    stacked [M,D] unit descriptor corpus."""
    from dani_slam_tpu.models.superpoint_train import make_textured_batch
    from dani_slam_tpu.models import superpoint
    from dani_slam_tpu.ops import frontend

    rng = np.random.RandomState(seed)
    descs = []

    @jax.jit
    def extract(img):
        heat, dm = superpoint.apply(sp_params, img)
        out = frontend.extract(heat, dm, n_max=n_per, threshold=threshold)
        return out["desc"], out["valid"]

    bs = 4
    for i in range(0, n_images, bs):
        imgs, _, _ = make_textured_batch(rng, bs, h, w)
        for b in range(bs):
            d, v = extract(jnp.asarray(imgs[b, ..., 0]))
            d = np.asarray(d)[np.asarray(v)]
            if len(d):
                descs.append(d.astype(np.float32))
    corpus = np.concatenate(descs, 0)
    n = np.linalg.norm(corpus, axis=-1, keepdims=True)
    return corpus / np.maximum(n, 1e-9)


def train_vocab(corpus: np.ndarray, n_words: int = 1024, iters: int = 40,
                seed: int = 0):
    from dani_slam_tpu.models import vocab

    key = jax.random.PRNGKey(seed)
    # k-means++ style seeding is overkill for unit descriptors; seed with
    # a random subset of the corpus (guarantees every word starts on-data)
    pick = np.random.RandomState(seed).choice(len(corpus), n_words,
                                              replace=False)
    cb0 = jnp.asarray(corpus[pick])
    cb = vocab.train_codebook(jnp.asarray(corpus),
                              jnp.ones((len(corpus),), bool), cb0,
                              iters=iters)
    return np.asarray(cb)


def save_vocab(path: str, codebook: np.ndarray):
    from dani_slam_tpu.utils.checkpoint import codebook_checksum
    np.savez(path, codebook=codebook.astype(np.float32),
             sha=np.frombuffer(codebook_checksum(codebook).encode(),
                               np.uint8))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--words", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "weights", "superpoint_voc.npz"))
    args = ap.parse_args()

    from dani_slam_tpu.models import superpoint as sp_mod
    sp_params = sp_mod.load_default_params()
    assert sp_params is not None, "shipped SuperPoint weights required"
    corpus = build_corpus(sp_params, n_images=args.images)
    print(f"corpus: {corpus.shape[0]} descriptors")
    cb = train_vocab(corpus, n_words=args.words, iters=args.iters)
    # quantization balance diagnostic: no dead words, no mega-words
    sim = corpus[:20000] @ cb.T
    words, counts = np.unique(np.argmax(sim, -1), return_counts=True)
    print(f"words used by 20k sample: {len(words)}/{args.words}, "
          f"top word {counts.max()} hits")
    save_vocab(args.out, cb)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
