"""Converter tests: official-architecture LightGlue public-checkpoint path.

The reference loads the authors' fine-tuned TorchScript LightGlue
(src/LightGlue.cpp:7-12). The real checkpoint is withheld, so these tests
exercise the converter against SYNTHETIC state dicts that carry the real
layer names and shapes of the public cvg/LightGlue release: the Flax forward
of the converted params must agree with an independent torch oracle of the
official compute graph (reference_forward_torch).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dani_slam_tpu.models import lightglue as lg
from dani_slam_tpu.models.lightglue_official import (
    LightGlueOfficial, load_lightglue_state_dict, reference_forward_torch)

torch = pytest.importorskip("torch")


def make_official_state_dict(dim=64, depth=2, heads=4, input_dim=32,
                             seed=0, prefix=""):
    """Random weights under the PUBLIC LightGlue layer names/shapes
    (cvg/LightGlue state_dict layout; what torch.jit.load exposes for the
    reference's lightglue_scripted_v2.pt)."""
    rng = np.random.RandomState(seed)
    hd = dim // heads
    sd = {}

    def lin(name, n_out, n_in, bias=True):
        sd[name + ".weight"] = torch.tensor(
            rng.randn(n_out, n_in).astype(np.float32) * 0.2)
        if bias:
            sd[name + ".bias"] = torch.tensor(
                rng.randn(n_out).astype(np.float32) * 0.05)

    lin("input_proj", dim, input_dim)
    sd["posenc.Wr.weight"] = torch.tensor(
        rng.randn(hd // 2, 2).astype(np.float32))
    for i in range(depth):
        t = f"transformers.{i}"
        lin(f"{t}.self_attn.Wqkv", 3 * dim, dim)
        lin(f"{t}.self_attn.out_proj", dim, dim)
        lin(f"{t}.self_attn.ffn.0", 2 * dim, 2 * dim)
        lin(f"{t}.self_attn.ffn.1", 0, 0) if False else None
        sd[f"{t}.self_attn.ffn.1.weight"] = torch.ones(2 * dim)
        sd[f"{t}.self_attn.ffn.1.bias"] = torch.zeros(2 * dim)
        lin(f"{t}.self_attn.ffn.3", dim, 2 * dim)
        lin(f"{t}.cross_attn.to_qk", dim, dim)
        lin(f"{t}.cross_attn.to_v", dim, dim)
        lin(f"{t}.cross_attn.to_out", dim, dim)
        lin(f"{t}.cross_attn.ffn.0", 2 * dim, 2 * dim)
        sd[f"{t}.cross_attn.ffn.1.weight"] = torch.ones(2 * dim)
        sd[f"{t}.cross_attn.ffn.1.bias"] = torch.zeros(2 * dim)
        lin(f"{t}.cross_attn.ffn.3", dim, 2 * dim)
        # per-layer assignment heads exist at every depth in the public
        # release; the converter must pick the LAST
        lin(f"log_assignment.{i}.final_proj", dim, dim)
        lin(f"log_assignment.{i}.matchability", 1, dim)
        lin(f"token_confidence.{i}.token.0", 1, dim)   # ignored by converter
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


class TestConverter:
    def test_forward_matches_torch_oracle(self):
        sd = make_official_state_dict(seed=3)
        model, params = load_lightglue_state_dict(sd,
                                                  compute_dtype=jnp.float32)
        assert model.dim == 64 and model.depth == 2 and model.heads == 4

        rng = np.random.RandomState(7)
        N0, N1 = 24, 20
        xy0 = rng.uniform(-1, 1, (N0, 2)).astype(np.float32)
        xy1 = rng.uniform(-1, 1, (N1, 2)).astype(np.float32)
        d0 = rng.randn(N0, 32).astype(np.float32)
        d1 = rng.randn(N1, 32).astype(np.float32)

        want = reference_forward_torch(sd, xy0, xy1, d0, d1)
        got, z0, z1 = model.apply(
            params, jnp.asarray(xy0)[None], jnp.asarray(xy1)[None],
            jnp.asarray(d0)[None], jnp.asarray(d1)[None],
            jnp.ones((1, N0), bool), jnp.ones((1, N1), bool))
        np.testing.assert_allclose(np.asarray(got[0]), want,
                                   rtol=1e-4, atol=1e-4)
        assert z0.shape == (1, N0) and z1.shape == (1, N1)

    def test_wrapper_prefix_stripped(self):
        sd = make_official_state_dict(seed=1, prefix="matcher.model.")
        model, params = load_lightglue_state_dict(sd,
                                                  compute_dtype=jnp.float32)
        sd_plain = make_official_state_dict(seed=1)
        model2, params2 = load_lightglue_state_dict(
            sd_plain, compute_dtype=jnp.float32)
        xy = jnp.zeros((1, 8, 2))
        d = jnp.ones((1, 8, 32))
        m = jnp.ones((1, 8), bool)
        a, _, _ = model.apply(params, xy, xy, d, d, m, m)
        b, _, _ = model2.apply(params2, xy, xy, d, d, m, m)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_matches_real_correspondences(self):
        """With structured weights the assignment should still prefer
        identical descriptors at identical positions (smoke: the converted
        model is a functioning matcher graph, masks respected)."""
        sd = make_official_state_dict(seed=5)
        model, params = load_lightglue_state_dict(sd,
                                                  compute_dtype=jnp.float32)
        rng = np.random.RandomState(2)
        N = 16
        xy = jnp.asarray(rng.uniform(-1, 1, (N, 2)).astype(np.float32))
        d = jnp.asarray(rng.randn(N, 32).astype(np.float32))
        mask = jnp.ones((N,), bool).at[N - 2:].set(False)
        scores, _, _ = model.apply(params, xy[None], xy[None], d[None],
                                   d[None], mask[None], mask[None])
        s = np.asarray(scores[0])
        # valid<->masked pairings must carry no probability mass (the
        # masked x masked corner normalizes to finite values; match_pairs
        # gates those out with the masks, same as production lightglue)
        assert np.all(s[N - 2:, :N - 2] <= -1e8)
        assert np.all(s[:N - 2, N - 2:] <= -1e8)

    def test_match_pairs_plumbing(self):
        """The converted model drops into the SLAM wiring: lightglue
        .match_pair accepts it (same call/return contract)."""
        sd = make_official_state_dict(seed=9)
        model, params = load_lightglue_state_dict(sd,
                                                  compute_dtype=jnp.float32)
        rng = np.random.RandomState(3)
        N = 12
        xy = jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32))
        d = jnp.asarray(rng.randn(N, 32).astype(np.float32))
        mask = jnp.ones((N,), bool)
        idx, score, ok = lg.match_pair(model, params, xy, d, mask,
                                       xy, d, mask, 640, 480)
        assert idx.shape == (N,) and score.shape == (N,) and ok.shape == (N,)

    def test_load_pt_file(self, tmp_path):
        """load_lightglue_pt handles a plain torch-saved state dict file
        (the TorchScript-archive path needs a scripted module; the state
        dict path is what public checkpoint releases ship)."""
        from dani_slam_tpu.models.lightglue_official import load_lightglue_pt
        sd = make_official_state_dict(seed=4)
        p = str(tmp_path / "lightglue.pt")
        torch.save(sd, p)
        ms = load_lightglue_pt(p)
        assert isinstance(ms, lg.MatcherState)
        assert ms.model.dim == 64 and ms.width == 640
