"""Place recognition: on-device descriptor quantization + dense BoW scoring.

Replaces the reference's DBoW3 vocabulary + inverted-file database
(reference: Thirdparty/DBow3 — k-means tree `Vocabulary.cpp`, inverted file
`KeyFrameDatabase.cc:mvInvertedFile`; candidate selection
KeyFrameDatabase::DetectNBestCandidates:606 and
DetectRelocalizationCandidates:735).

TPU-first re-design: a hierarchical CPU tree walk becomes ONE matmul —
descriptors [N,D] x codebook [V,D]^T -> argmax word ids; a keyframe's BoW is
a dense tf-idf vector [V]; database scoring is a single [K,V]x[V] matvec on
the MXU; the covisibility-group accumulation that DBoW3 does with hash maps
is a sparse-matrix product with the covisibility mask. No inverted lists, no
pointer chasing — everything stays in HBM.

The codebook can be k-means-trained on the fly from accumulated descriptors
(train_codebook) or seeded with random unit vectors (fine for matching
SuperPoint's unit-norm descriptors when no corpus is available yet).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def random_codebook(key, n_words: int = 1024, dim: int = 256) -> jax.Array:
    c = jax.random.normal(key, (n_words, dim))
    return c / jnp.linalg.norm(c, axis=-1, keepdims=True)


def load_default_codebook(dim: int = 256):
    """Load the shipped pre-trained vocabulary (reference: the system loads
    superpoint_voc.yml before tracking starts, src/System.cc:117-127).
    Returns the [V,dim] codebook or None when absent / dim-mismatched
    (synthetic-feature tests run D=64 and keep the self-training path)."""
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "superpoint_voc.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    cb = data["codebook"]
    if cb.shape[1] != dim:
        return None
    if "sha" in data.files:
        from dani_slam_tpu.utils.checkpoint import codebook_checksum
        want = bytes(data["sha"]).decode()
        got = codebook_checksum(cb)
        if want != got:
            raise ValueError(f"vocabulary checksum mismatch: {path}")
    return jnp.asarray(cb)


@partial(jax.jit, static_argnames=("iters",))
def train_codebook(desc: jax.Array, mask: jax.Array, codebook0: jax.Array,
                   iters: int = 10) -> jax.Array:
    """Spherical k-means on unit descriptors (masked). One matmul + one
    scatter-mean per iteration."""
    V = codebook0.shape[0]

    def step(_, cb):
        sim = desc @ cb.T                               # [N,V]
        w = jnp.argmax(sim, axis=-1)
        w = jnp.where(mask, w, V)                       # park invalid
        sums = jnp.zeros((V + 1, desc.shape[1])).at[w].add(
            jnp.where(mask[:, None], desc, 0.0))[:V]
        norm = jnp.linalg.norm(sums, axis=-1, keepdims=True)
        return jnp.where(norm > 1e-6, sums / norm.clip(1e-6), cb)

    return jax.lax.fori_loop(0, iters, step, codebook0)


@jax.jit
def update_bow_row(bow: jax.Array, kf_desc: jax.Array, kf_kp_mask: jax.Array,
                   k: jax.Array, codebook: jax.Array):
    """Quantize keyframe k's descriptors and write its BoW row — ONE cached
    program with a TRACED slot index. (Host-int indexing like kf_desc[5]
    bakes the index as a constant and re-compiles per keyframe slot; through
    a remote-compile transport that is seconds per new slot.) Returns
    (bow, row)."""
    w = quantize(kf_desc[k], kf_kp_mask[k], codebook)
    row = bow_vector(w, codebook.shape[0])
    return bow.at[k].set(row), row


@jax.jit
def quantize(desc: jax.Array, mask: jax.Array, codebook: jax.Array):
    """Descriptors -> word ids [N] (argmax cosine; -1 for invalid)."""
    sim = jnp.dot(desc, codebook.T, preferred_element_type=jnp.float32)
    w = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    return jnp.where(mask, w, -1)


@partial(jax.jit, static_argnames=("n_words",))
def bow_vector(words: jax.Array, n_words: int | None = None,
               codebook: jax.Array | None = None) -> jax.Array:
    """Word ids -> L1-normalized term-frequency vector [V]."""
    V = n_words if n_words is not None else codebook.shape[0]
    valid = words >= 0
    # scatter-free histogram: a [V,N] compare-and-reduce streams through the
    # VPU; the .at[].add scatter serializes on TPU (core/scatterless.py) and
    # made this the priciest op of the per-keyframe BoW update
    from dani_slam_tpu.core import scatterless as sless
    tf = sless.id_count(jnp.where(valid, words, 0), valid, V).astype(
        jnp.float32)
    return tf / jnp.maximum(tf.sum(), 1.0)


@jax.jit
def bow_l1_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """DBoW3 L1 similarity: s = 1 - 0.5 |a/|a| - b/|b||_1, broadcastable."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


@jax.jit
def idf_weights(bow_db: jax.Array, kf_mask: jax.Array) -> jax.Array:
    """Inverse document frequency over the LIVE database [V] (DBoW3's
    default TF_IDF weighting, Thirdparty/DBow3 Vocabulary::create — there
    idf comes from the training corpus; here the keyframe database IS the
    corpus, so common words are discounted adaptively)."""
    present = (bow_db > 0) & kf_mask[:, None]
    df = jnp.sum(present.astype(jnp.float32), axis=0)
    n = jnp.maximum(jnp.sum(kf_mask.astype(jnp.float32)), 1.0)
    return jnp.log((n + 1.0) / (df + 1.0)) + 1.0


def _tfidf_rows(bow: jax.Array, idf: jax.Array) -> jax.Array:
    w = bow * idf
    return w / jnp.maximum(jnp.sum(jnp.abs(w), axis=-1, keepdims=True),
                           1e-9)


@jax.jit
def rebuild_bow_rows(kf_desc: jax.Array, kf_kp_mask: jax.Array,
                     kf_mask: jax.Array, codebook: jax.Array) -> jax.Array:
    """Re-quantize every keyframe's descriptors against a (new) codebook
    and rebuild the dense BoW database [K,V] in one batched pass."""
    V = codebook.shape[0]

    def row(desc, m, occ):
        w = quantize(desc, m & occ, codebook)
        return bow_vector(w, V)

    return jax.vmap(row)(kf_desc, kf_kp_mask, kf_mask)


class PlaceDB:
    """Dense BoW database over keyframe slots (device-resident)."""

    def __init__(self, codebook: jax.Array, n_kf: int):
        self.codebook = codebook
        self.bow = jnp.zeros((n_kf, codebook.shape[0]))

    def add(self, kf: int, desc: jax.Array, mask: jax.Array):
        w = quantize(desc, mask, self.codebook)
        self.bow = self.bow.at[kf].set(bow_vector(w, self.codebook.shape[0]))

    def remove(self, kf: int):
        self.bow = self.bow.at[kf].set(0.0)


@partial(jax.jit, static_argnames=("n_best",))
def detect_candidates(bow_db: jax.Array, kf_mask: jax.Array,
                      query_bow: jax.Array, covis: jax.Array,
                      query_kf: jax.Array, n_best: int = 3,
                      min_covis_exclude: int = 15):
    """Loop/merge candidate detection (reference:
    KeyFrameDatabase::DetectNBestCandidates KeyFrameDatabase.cc:606):
    score all keyframes, boost by covisibility-group accumulation, exclude
    the query's own covisible neighborhood, return top-n ids + scores.
    Scoring is tf-idf weighted (DBoW3 TF_IDF default).

    min_covis_exclude mirrors the reference's CONNECTED-keyframe exclusion
    (KeyFrameDatabase.cc:609-628 skips spConnectedKF): covisibility graph
    connections require >= 15 common observations (KeyFrame::
    UpdateConnections th=15, KeyFrame.cc:421), so a handful of shared
    points — normal between a loop candidate and the query after a full
    circuit — must NOT disqualify it."""
    idf = idf_weights(bow_db, kf_mask)
    db_w = _tfidf_rows(bow_db, idf)
    q_w = _tfidf_rows(query_bow[None], idf)[0]
    # connected keyframes never enter the candidate pool NOR the group
    # accumulation (the reference marks only non-connected KFs with
    # mnPlaceRecognitionQuery, and the accumulation loop skips unmarked
    # neighbors, KeyFrameDatabase.cc:622-633,688-691) — otherwise the
    # query's own high-scoring neighborhood inflates groups adjacent to it
    # and trivial near-past candidates outrank true loop closures
    connected = (covis[query_kf] >= min_covis_exclude)
    eligible = kf_mask & ~connected & \
        (jnp.arange(bow_db.shape[0]) != query_kf)
    # shared-word gate: > 0.8 * maxCommonWords among the eligible pool
    # (KeyFrameDatabase.cc:642-650)
    shared = (bow_db > 0).astype(jnp.float32) @ (query_bow > 0).astype(
        jnp.float32)                                    # [K]
    shared = jnp.where(eligible, shared, 0.0)
    gated = eligible & (shared > 0.8 * jnp.max(shared)) & (shared > 0)
    scores = jnp.where(gated, bow_l1_score(db_w, q_w[None]), 0.0)  # [K]
    # group score: accumulate over covisible sets (matmul with boolean covis)
    K = covis.shape[0]
    # scatter-free diagonal (a [K] scatter serializes on TPU)
    group = jnp.where(jnp.eye(K, dtype=bool), 1.0,
                      (covis > 10).astype(jnp.float32))
    acc = group @ scores
    acc = jnp.where(gated, acc, -1.0)
    vals, idx = jax.lax.top_k(acc, n_best)
    return idx.astype(jnp.int32), vals


@partial(jax.jit, static_argnames=("n_best",))
def detect_reloc_candidates(bow_db: jax.Array, kf_mask: jax.Array,
                            query_bow: jax.Array, covis: jax.Array = None,
                            n_best: int = 5):
    """Relocalization candidates (reference:
    DetectRelocalizationCandidates KeyFrameDatabase.cc:735-858), the full
    three-stage semantics:

      1. shared-word gate: only keyframes sharing >= 0.8 * maxCommonWords
         words with the query stay (KeyFrameDatabase.cc:778-790);
      2. L1 tf-idf similarity on the survivors;
      3. covisibility-group accumulation: each candidate's score is summed
         over its covisible group, the group's BEST member represents it,
         and groups below 0.75 * bestAccScore are cut
         (KeyFrameDatabase.cc:810-858).

    Dense TPU formulation: shared-word counts are one [K,V]x[V] matvec on
    word-presence indicators; group accumulation is a masked [K,K] matmul
    with the covisibility matrix. Returns (idx [n_best], accumulated
    scores, keep mask). covis=None (feature-only callers) skips stage 3."""
    idf = idf_weights(bow_db, kf_mask)
    db_w = _tfidf_rows(bow_db, idf)
    q_w = _tfidf_rows(query_bow[None], idf)[0]
    # stage 1: shared-word count gate
    shared = (bow_db > 0).astype(jnp.float32) @ (query_bow > 0).astype(
        jnp.float32)                                    # [K]
    shared = jnp.where(kf_mask, shared, 0.0)
    min_common = 0.8 * jnp.max(shared)
    gate = kf_mask & (shared >= jnp.maximum(min_common, 1.0))
    # stage 2: L1 similarity of gated candidates
    scores = jnp.where(gate, bow_l1_score(db_w, q_w[None]), 0.0)
    if covis is None:
        acc = jnp.where(gate, scores, -1.0)
        vals, idx = jax.lax.top_k(acc, n_best)
        keep = (vals >= 0.8 * vals[0]) & (vals > 0)
        return idx.astype(jnp.int32), vals, keep
    # stage 3: accumulate over covisible groups (>=10 shared observations,
    # the reference's GetBestCovisibilityKeyFrames(10) neighborhood)
    group = jnp.where(jnp.eye(covis.shape[0], dtype=bool), 1.0,
                      (covis > 10).astype(jnp.float32))
    acc = group @ scores                                # [K] group score
    # each group is represented by its best-scoring member
    member_best = jnp.max(jnp.where(group > 0, scores[None, :], -1.0),
                          axis=1)
    best_in_group = jnp.argmax(jnp.where(group > 0, scores[None, :], -1.0),
                               axis=1)
    acc = jnp.where(gate, acc, -1.0)
    vals, gidx = jax.lax.top_k(acc, n_best)
    idx = best_in_group[gidx]
    keep = (vals >= 0.75 * vals[0]) & (vals > 0) & \
        (member_best[gidx] > 0)
    # overlapping covisible groups can collapse onto the SAME best member:
    # de-duplicate ranks so the caller's per-candidate attempts are not
    # wasted re-trying one keyframe (reference dedups via spAlreadyAddedKF,
    # KeyFrameDatabase.cc:820-840)
    for r in range(1, n_best):
        dup = jnp.any(idx[r] == idx[:r])
        keep = keep.at[r].set(keep[r] & ~dup)
    return idx.astype(jnp.int32), vals, keep
