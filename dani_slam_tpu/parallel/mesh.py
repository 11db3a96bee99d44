"""Device-mesh utilities and sharded solver entry points.

The reference is a single-process, shared-memory system (SURVEY.md §2.4 —
no NCCL/MPI anywhere); parity does not require multi-chip. This module is
the TPU-native scaling path beyond parity: shard the SLAM workload over a
`jax.sharding.Mesh` and let GSPMD insert the collectives.

What shards well in this architecture:
  * Bundle adjustment: the landmark dimension. H_ll/H_pl/one-hot matmul
    partition over L; the Schur reduction psums partial [P,P,6,6] blocks
    over ICI. (`sharded_ba_solve`)
  * The learned front-end's training step: batch over 'data', conv channels
    over 'model'. (`parallel/train.py`, used by __graft_entry__)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_landmarks(mesh: Mesh, lm_pos, lm_valid, axis: str = "data"):
    """Place landmark arrays row-sharded over the mesh."""
    s = NamedSharding(mesh, P(axis))
    return jax.device_put(lm_pos, s), jax.device_put(lm_valid, s)


def sharded_gba(mesh: Mesh, st, cam, iters: int = 10,
                axis: str = "data"):
    """Whole-map global BA with the landmark tables sharded over the mesh
    (the SURVEY §2.4 "run GBA on a second chip" scaling path): lm_pos /
    lm_mask are row-sharded, keyframe state is replicated, and GSPMD
    partitions the Schur-free PCG solve (ops/ba_large.ba_solve_pcg) —
    the per-landmark H_ll/g_l segment sums and the landmark
    back-substitution run on the landmark shards; the [P,6] CG reductions
    all-reduce over ICI. Returns the same BAResult as the single-device
    loopclosing.global_bundle_adjustment solve."""
    from dani_slam_tpu.ops import ba_large
    from dani_slam_tpu.slam.loopclosing import _gba_problem

    pose_fixed, okf, olm, oxy, ovalid, obs_info = _gba_problem(st)
    lshard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    lm0 = jax.device_put(st.lm_pos, lshard)
    lmv = jax.device_put(st.lm_mask, lshard)
    with mesh:
        return ba_large.ba_solve_pcg(
            jax.device_put(st.kf_R, rep), jax.device_put(st.kf_t, rep),
            pose_fixed, lm0, lmv, cam, okf, olm, oxy, ovalid,
            obs_info=obs_info, iters=iters)


def sharded_ba_solve(mesh: Mesh, *args, axis: str = "data", **kwargs):
    """ops/ba.ba_solve with the landmark dimension sharded over the mesh.

    The solver body is unchanged — GSPMD propagates the L-sharding through
    the one-hot matmuls and inserts an all-reduce (psum over ICI) for the
    Schur off-diagonal blocks. Callers pass the same arguments as ba_solve;
    landmark-indexed inputs are resharded here.
    """
    from dani_slam_tpu.ops import ba as ba_ops

    (R0, t0, pose_fixed, lm0, lm_valid, cam,
     obs_kf, obs_lm, obs_xy, obs_valid) = args[:10]
    rest = args[10:]
    lshard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    lm0 = jax.device_put(lm0, lshard)
    lm_valid = jax.device_put(lm_valid, lshard)
    with mesh:
        return ba_ops.ba_solve(
            jax.device_put(R0, rep), jax.device_put(t0, rep), pose_fixed,
            lm0, lm_valid, cam, obs_kf, obs_lm, obs_xy, obs_valid,
            *rest, **kwargs)
