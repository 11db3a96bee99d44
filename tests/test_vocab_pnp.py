"""Place-recognition (BoW) and PnP RANSAC tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie
from dani_slam_tpu.models import vocab
from dani_slam_tpu.ops import pnp

RNG = np.random.RandomState(17)
CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)


def unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestVocab:
    def test_quantize_matches_nearest(self):
        cb = vocab.random_codebook(jax.random.PRNGKey(0), 64, 32)
        # queries = slightly noisy codewords
        ids = RNG.randint(0, 64, 100)
        q = np.asarray(cb)[ids] + RNG.randn(100, 32) * 0.05
        w = vocab.quantize(jnp.asarray(unit(q), jnp.float32),
                           jnp.ones(100, bool), cb)
        assert (np.asarray(w) == ids).mean() > 0.95

    def test_bow_similarity_discriminates(self):
        cb = vocab.random_codebook(jax.random.PRNGKey(0), 128, 32)
        descA = unit(RNG.randn(200, 32)).astype(np.float32)
        descB = unit(RNG.randn(200, 32)).astype(np.float32)
        m = jnp.ones(200, bool)
        wA = vocab.quantize(jnp.asarray(descA), m, cb)
        wA2 = vocab.quantize(jnp.asarray(
            unit(descA + RNG.randn(200, 32) * 0.05).astype(np.float32)), m, cb)
        wB = vocab.quantize(jnp.asarray(descB), m, cb)
        bA = vocab.bow_vector(wA, 128)
        bA2 = vocab.bow_vector(wA2, 128)
        bB = vocab.bow_vector(wB, 128)
        same = float(vocab.bow_l1_score(bA, bA2))
        diff = float(vocab.bow_l1_score(bA, bB))
        assert same > diff + 0.2

    def test_detect_candidates_excludes_neighbors(self):
        K, V = 16, 64
        cb = vocab.random_codebook(jax.random.PRNGKey(1), V, 32)
        bow = jnp.zeros((K, V))
        q = jnp.zeros((V,)).at[:8].set(1 / 8)
        # kf5 identical to query; kf3 identical but covisible with query kf0
        bow = bow.at[5].set(q).at[3].set(q)
        covis = jnp.zeros((K, K), jnp.int32).at[0, 3].set(50).at[3, 0].set(50)
        kf_mask = jnp.ones(K, bool)
        idx, vals = vocab.detect_candidates(bow, kf_mask, q, covis,
                                            jnp.asarray(0), n_best=3)
        assert int(idx[0]) == 5
        assert 3 not in set(np.asarray(idx)[np.asarray(vals) > 0].tolist())

    def test_train_codebook_improves_quantization(self):
        # two well-separated clusters
        c1 = unit(RNG.randn(1, 16)).repeat(100, 0) + RNG.randn(100, 16) * .05
        c2 = unit(RNG.randn(1, 16)).repeat(100, 0) + RNG.randn(100, 16) * .05
        data = jnp.asarray(unit(np.concatenate([c1, c2])), jnp.float32)
        cb0 = vocab.random_codebook(jax.random.PRNGKey(2), 2, 16)
        cb = vocab.train_codebook(data, jnp.ones(200, bool), cb0)
        w = np.asarray(vocab.quantize(data, jnp.ones(200, bool), cb))
        # each cluster maps to one word
        assert len(set(w[:100])) == 1 and len(set(w[100:])) == 1
        assert w[0] != w[150]


class TestTfIdf:
    def test_common_words_discounted(self):
        """A word present in every keyframe carries no discrimination; idf
        must downweight it so scoring is driven by the rare words."""
        K, V = 6, 8
        kf_mask = jnp.ones(K, bool)
        # all KFs share word 0 heavily; KFs differ in one rare word each
        bow = np.full((K, V), 0.0, np.float32)
        bow[:, 0] = 0.8
        for k in range(K):
            bow[k, 1 + k % (V - 1)] = 0.2
        bow = jnp.asarray(bow / bow.sum(1, keepdims=True))
        idf = vocab.idf_weights(bow, kf_mask)
        assert float(idf[0]) < float(idf[2])    # ubiquitous word discounted
        # query = KF 2's signature: with tf-idf, KF 2 must win clearly
        q = bow[2]
        dbw = vocab._tfidf_rows(bow, idf)
        qw = vocab._tfidf_rows(q[None], idf)[0]
        s = np.asarray(vocab.bow_l1_score(dbw, qw[None]))
        assert s.argmax() == 2
        margin_tfidf = np.sort(s)[-1] - np.sort(s)[-2]
        s_plain = np.asarray(vocab.bow_l1_score(bow, q[None]))
        margin_plain = np.sort(s_plain)[-1] - np.sort(s_plain)[-2]
        assert margin_tfidf > margin_plain      # sharper separation

    def test_rebuild_bow_rows(self):
        rng = np.random.RandomState(0)
        K, N, D, V = 4, 16, 32, 8
        desc = rng.randn(K, N, D).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        kp_mask = jnp.ones((K, N), bool)
        kf_mask = jnp.asarray([True, True, False, True])
        cb = vocab.random_codebook(jax.random.PRNGKey(1), V, D)
        rows = vocab.rebuild_bow_rows(jnp.asarray(desc), kp_mask, kf_mask,
                                      cb)
        assert rows.shape == (K, V)
        assert float(jnp.abs(rows[0].sum() - 1.0)) < 1e-5
        assert float(rows[2].sum()) == 0.0      # dead keyframe row empty


class TestPnP:
    def _data(self, n=128, noise=0.5, outlier_frac=0.3, seed=4):
        rng = np.random.RandomState(seed)
        pts = rng.randn(n, 3).astype(np.float32)
        pts[:, 2] = rng.uniform(3, 10, n)
        pts[:, 0] *= 2
        xi = jnp.asarray([0.3, -0.1, 0.05, 0.1, -0.2, 0.05])
        R, t = lie.se3_exp(xi)
        obs = cameras.project(CAM, lie.se3_apply(R, t, jnp.asarray(pts)))
        obs = obs + noise * jnp.asarray(rng.randn(n, 2), jnp.float32)
        n_out = int(n * outlier_frac)
        obs = obs.at[:n_out].add(
            jnp.asarray(rng.uniform(40, 120, (n_out, 2)), jnp.float32))
        return jnp.asarray(pts), obs, (R, t), n_out

    def test_recovers_pose_with_outliers(self):
        pts, obs, (R_t, t_t), n_out = self._data()
        res = pnp.pnp_ransac(jax.random.PRNGKey(0), CAM, pts, obs,
                             jnp.ones(pts.shape[0], bool))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_t),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=2e-2)
        assert int(res.inliers[:n_out].sum()) < 5

    def test_fails_gracefully_with_garbage(self):
        rng = np.random.RandomState(9)
        pts = jnp.asarray(rng.randn(64, 3).astype(np.float32) +
                          np.array([0, 0, 5], np.float32))
        obs = jnp.asarray(rng.uniform(0, 640, (64, 2)), jnp.float32)
        res = pnp.pnp_ransac(jax.random.PRNGKey(1), CAM, pts, obs,
                             jnp.ones(64, bool))
        assert not bool(res.ok)

    def test_respects_mask(self):
        pts, obs, (R_t, t_t), _ = self._data(outlier_frac=0.0)
        # poison unmasked region
        obs = obs.at[64:].set(0.0)
        mask = jnp.zeros(pts.shape[0], bool).at[:64].set(True)
        res = pnp.pnp_ransac(jax.random.PRNGKey(2), CAM, pts, obs, mask)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=2e-2)


class TestDetectionGatesProductionCaps:
    """Round-4 verdict: the loop-detection gate semantics (fixed in
    a612c3c after n_loops=0 surfaced ON-DEVICE only) get unit coverage at
    production capacities so regressions fail in the fast tier, not the
    bench. Reference: KeyFrameDatabase::DetectNBestCandidates
    src/KeyFrameDatabase.cc:606-700; connection threshold
    KeyFrame::UpdateConnections th=15, src/KeyFrame.cc:421."""

    def test_weakly_overlapping_candidate_not_excluded(self):
        """The a612c3c defect: after a full circuit the TRUE loop candidate
        shares a handful of observations with the query (covis > 0 but
        below the 15-obs connection threshold). Excluding ALL covis>0
        keyframes silently drops it; only CONNECTED (>=15) keyframes are
        excluded (the reference excludes spConnectedKeyFrames only)."""
        K, V = 256, 512
        q = jnp.zeros((V,)).at[:16].set(1 / 16)
        bow = jnp.zeros((K, V)).at[40].set(q)
        # true candidate at slot 40 shares 10 common observations with the
        # query at slot 200 — weakly overlapping, NOT connected
        covis = jnp.zeros((K, K), jnp.int32)
        covis = covis.at[200, 40].set(10).at[40, 200].set(10)
        # the query's real neighborhood IS connected (and identical bow)
        covis = covis.at[200, 199].set(120).at[199, 200].set(120)
        bow = bow.at[199].set(q)
        kf_mask = jnp.zeros(K, bool).at[:210].set(True)
        idx, vals = vocab.detect_candidates(bow, kf_mask, q, covis,
                                            jnp.asarray(200), n_best=3)
        kept = set(np.asarray(idx)[np.asarray(vals) > 0].tolist())
        assert 40 in kept, (idx, vals)
        assert 199 not in kept, "connected neighbor leaked into candidates"

    def test_shared_word_gate_cuts_low_overlap(self):
        """> 0.8*maxCommonWords shared-word gate
        (KeyFrameDatabase.cc:642-650): a keyframe sharing far fewer words
        than the best is cut even if its tf-idf score on those few words
        would be large."""
        K, V = 256, 512
        # query uses words 0..19 uniformly
        q = jnp.zeros((V,)).at[:20].set(1 / 20)
        bow = jnp.zeros((K, V))
        # candidate A: shares all 20 words
        bow = bow.at[10, :20].set(1 / 20)
        # candidate B: shares only 10 (< 0.8*20 = 16) but matches the query
        # distribution perfectly on them (high L1 overlap on the shared set)
        bow = bow.at[20, :10].set(1 / 10)
        covis = jnp.zeros((K, K), jnp.int32)
        kf_mask = jnp.zeros(K, bool).at[:30].set(True)
        idx, vals = vocab.detect_candidates(bow, kf_mask, q, covis,
                                            jnp.asarray(25), n_best=3)
        kept = set(np.asarray(idx)[np.asarray(vals) > 0].tolist())
        assert 10 in kept
        assert 20 not in kept, "low-shared-word candidate passed the gate"

    def test_drifted_loop_detects_at_production_caps(self):
        """End-to-end detection semantics on the bench's drifted-loop map
        at PRODUCTION slot caps (K=256): the final keyframe of the orbit
        must rank a loop-gap partner (one of the first keyframes) as its
        top candidate — the exact configuration whose silent n_loops=0
        regression round 4 only caught on-device."""
        from dani_slam_tpu.core import state as mstate
        from dani_slam_tpu.utils.synthetic import make_drifted_loop_state

        caps = mstate.MapCaps()          # K=256 production slot caps
        st, kf_ids, _, _ = make_drifted_loop_state(CAM, caps, K=16)
        cb = vocab.random_codebook(jax.random.PRNGKey(0), 512, caps.D)
        desc = st.kf_desc.reshape(-1, caps.D)
        dmask = (st.kf_kp_mask & st.kf_mask[:, None]).reshape(-1)
        cb = vocab.train_codebook(desc, dmask, cb)
        bow = vocab.rebuild_bow_rows(st.kf_desc, st.kf_kp_mask, st.kf_mask,
                                     cb)
        kf_q = kf_ids[-1]
        idx, vals = vocab.detect_candidates(
            bow, st.kf_mask, bow[kf_q], st.covis, jnp.asarray(kf_q),
            n_best=3)
        kept = [int(i) for i, v in zip(np.asarray(idx), np.asarray(vals))
                if v > 0]
        assert kept, "no candidates at production caps"
        # the loop partner: an early-orbit keyframe, NOT the query's
        # immediate covisible past
        assert kept[0] in kf_ids[:4], (kept, kf_ids)
