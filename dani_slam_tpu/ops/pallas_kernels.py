"""Pallas TPU kernels for the hot matching path.

The projected-window search (ops/matching.py) is the most frequent compute
pattern in the system — several searches per frame, each a masked [M,N]
descriptor-distance problem. The XLA path materializes the full distance
matrix in HBM (e.g. 8192x1024 f32 = 32 MB per search) just to reduce it to
per-row (best, second, argmin). This kernel fuses matmul + window predicate
+ running top-2 reduction flash-attention-style: descriptor tiles stream
through VMEM, the MXU computes dot-product tiles, and only the [M]-sized
running reductions ever leave the chip — HBM traffic drops from O(M*N) to
O((M+N)*D).

Grid: rows of queries (TM at a time); the kernel loops over target tiles of
TN columns with a fori_loop carrying (best, second, argmin).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256          # query rows per grid step
TN = 512          # target columns per inner tile
BIG = 1e9


def _match_kernel(qdesc_ref, qxy_ref, qvalid_ref, tdesc_ref, txy_ref,
                  tvalid_ref, r2_ref, best_ref, second_ref, idx_ref,
                  cbest_ref, cidx_ref):
    """One TM-row block: stream all N targets in TN tiles.

    Row outputs (best/second/idx) are per-grid-block; the COLUMN outputs
    (cbest/cidx — best query per target, for scatter-free target-side
    bindings) are accumulated across the sequential TPU grid via a pinned
    output block (index_map -> same block every step)."""
    gi = pl.program_id(0)
    n_total = tdesc_ref.shape[0]
    n_tiles = n_total // TN

    @pl.when(gi == 0)
    def _init_cols():
        cbest_ref[:] = jnp.full_like(cbest_ref, BIG)
        cidx_ref[:] = jnp.zeros_like(cidx_ref)

    q = qdesc_ref[:].astype(jnp.bfloat16)              # [TM,D]
    qx = qxy_ref[:, 0:1]
    qy = qxy_ref[:, 1:2]
    qv = qvalid_ref[:]                                 # [TM,1] float (1/0)
    r2 = r2_ref[:]                                     # [TM,1] per-query r^2

    # Dead-tile skip: track-local-map queries are the FULL landmark table
    # (M = L = 32768 slots) of which only the live prefix is valid — slots
    # are first-free allocated, so ~90% of query tiles carry zero valid
    # rows. A dead tile cannot win any column, and its row outputs are all
    # BIG/0; skip the whole target sweep for it (measured: the bulk of the
    # per-frame local-map search time at production caps).
    any_q = jnp.sum(qv) > 0.0

    @pl.when(jnp.logical_not(any_q))
    def _dead_tile():
        best_ref[:] = jnp.full_like(best_ref, BIG)
        second_ref[:] = jnp.full_like(second_ref, BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    def tile(i, carry):
        best, second, idx = carry
        t = tdesc_ref[pl.ds(i * TN, TN), :].astype(jnp.bfloat16)  # [TN,D]
        # precision must be pinned to DEFAULT: the process-global
        # jax_default_matmul_precision='highest' (System guards f32 SLAM
        # geometry with it) otherwise leaks in as contract_precision=fp32,
        # which Mosaic rejects for bf16 operands ("Bad lhs type")
        dots = jax.lax.dot_general(
            q, t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)       # [TM,TN]
        dist = jnp.maximum(2.0 - 2.0 * dots, 0.0)

        tx = txy_ref[pl.ds(i * TN, TN), 0]
        ty = txy_ref[pl.ds(i * TN, TN), 1]
        tv = tvalid_ref[pl.ds(i * TN, TN), 0]
        dx = qx - tx[None, :]
        dy = qy - ty[None, :]
        inwin = ((dx * dx + dy * dy) <= r2) & (tv[None, :] > 0) & (qv > 0)
        dist = jnp.where(inwin, dist, BIG)

        # tile-local best & second
        tb1 = jnp.min(dist, axis=1, keepdims=True)                # [TM,1]
        targ = jnp.argmin(dist, axis=1)                           # [TM]
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist2 = jnp.where(col == targ[:, None], BIG, dist)
        tb2 = jnp.min(dist2, axis=1, keepdims=True)
        tidx = (targ + i * TN)[:, None]

        # column-side: best query row of this [TM,TN] tile, merged into the
        # running per-target winners (strict < keeps the earliest row on
        # ties, matching XLA argmin-over-rows semantics)
        c1 = jnp.min(dist, axis=0)                                # [TN]
        crow = jnp.argmin(dist, axis=0) + gi * TM                 # [TN]
        cur = cbest_ref[pl.ds(i * TN, TN), 0]
        curi = cidx_ref[pl.ds(i * TN, TN), 0]
        upd = c1 < cur
        cbest_ref[pl.ds(i * TN, TN), 0] = jnp.where(upd, c1, cur)
        cidx_ref[pl.ds(i * TN, TN), 0] = jnp.where(upd, crow, curi)

        # merge running (best, second) with tile (tb1, tb2)
        new_best = jnp.minimum(best, tb1)
        new_idx = jnp.where(tb1 < best, tidx, idx)
        new_second = jnp.minimum(jnp.maximum(best, tb1),
                                 jnp.minimum(second, tb2))
        return new_best, new_second, new_idx

    @pl.when(any_q)
    def _live_tile():
        init = (jnp.full((TM, 1), BIG), jnp.full((TM, 1), BIG),
                jnp.zeros((TM, 1), jnp.int32))
        best, second, idx = jax.lax.fori_loop(0, n_tiles, tile, init)
        best_ref[:] = best
        second_ref[:] = second
        idx_ref[:] = idx


def _pad_rows(a, m, fill=0.0):
    pad = m - a.shape[0]
    if pad <= 0:
        return a
    width = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
    return jnp.pad(a, width, constant_values=fill)


@partial(jax.jit, static_argnames=("interpret",))
def window_match_topk2(qdesc, qxy, qvalid, tdesc, txy, tvalid, radius,
                       interpret: bool = False):
    """Fused masked window match.

    qdesc [M,D], qxy [M,2], qvalid [M] bool; tdesc [N,D], txy [N,2],
    tvalid [N] bool; radius scalar or [M]. Returns (best [M], second [M],
    idx [M], col_best [N], col_idx [N]) with BIG (1e9) distances where no
    admissible pairing exists; distances are SQUARED L2 (2-2*dot). The
    col_* outputs give the best query per target (for scatter-free
    target-side bindings, see matching.search_by_projection_bind).
    """
    M, D = qdesc.shape
    N = tdesc.shape[0]
    Mp = -(-M // TM) * TM
    Np = -(-N // TN) * TN

    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (M,))
    r2 = (r * r)[:, None]

    args = (
        _pad_rows(qdesc.astype(jnp.float32), Mp),
        _pad_rows(qxy.astype(jnp.float32), Mp),
        _pad_rows(qvalid.astype(jnp.float32)[:, None], Mp),
        _pad_rows(tdesc.astype(jnp.float32), Np),
        _pad_rows(txy.astype(jnp.float32), Np, fill=1e9),
        _pad_rows(tvalid.astype(jnp.float32)[:, None], Np),
        _pad_rows(r2, Mp),
    )

    grid = (Mp // TM,)
    qspec = lambda c: pl.BlockSpec((TM, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    tspec = lambda c: pl.BlockSpec((Np, c), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    best, second, idx, cbest, cidx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[qspec(D), qspec(2), qspec(1), tspec(D), tspec(2),
                  tspec(1), qspec(1)],
        out_specs=[qspec(1), qspec(1), qspec(1), tspec(1), tspec(1)],
        out_shape=[jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.int32)],
        interpret=interpret,
    )(*args)
    return (best[:M, 0], second[:M, 0], idx[:M, 0],
            cbest[:N, 0], cidx[:N, 0])


def window_match_topk2_xla(qdesc, qxy, qvalid, tdesc, txy, tvalid, radius):
    """Reference XLA implementation (materializes the full matrix) — used
    for CPU tests and as the numerics oracle for the kernel. Matches the
    kernel's bf16 matmul precision so gates behave identically."""
    dots = jnp.dot(qdesc.astype(jnp.bfloat16), tdesc.astype(jnp.bfloat16).T,
                   preferred_element_type=jnp.float32)
    dist = jnp.maximum(2.0 - 2.0 * dots, 0.0)
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (qdesc.shape[0],))
    dx = qxy[:, None, 0] - txy[None, :, 0]
    dy = qxy[:, None, 1] - txy[None, :, 1]
    mask = (((dx * dx + dy * dy) <= (r * r)[:, None]) &
            tvalid[None, :] & qvalid[:, None])
    dist = jnp.where(mask, dist, BIG)
    idx = jnp.argmin(dist, axis=1)
    best = jnp.min(dist, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d2 = jnp.where(col == idx[:, None], BIG, dist)
    second = jnp.min(d2, axis=1)
    cbest = jnp.min(dist, axis=0)
    cidx = jnp.argmin(dist, axis=0)
    return (best, second, idx.astype(jnp.int32),
            cbest, cidx.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Local-BA landmark-block accumulation
# ---------------------------------------------------------------------------
#
# Every LM iteration of ba_solve reduces per-observation Jacobian blocks
# into per-landmark blocks:  H_ll[l] = sum over obs of lm l of JtJ_l,
# g_l[l] likewise, and H_pl[p,l] per (keyframe, landmark) pair. The XLA
# path expresses these as one-hot matmuls over a [P,N,L] indicator
# (~134 MB f32 at production caps) streamed from HBM once per einsum per
# iteration — the dominant memory traffic of the local-BA solve
# (reference semantics: g2o BlockSolver_6_3 landmark-block construction,
# Thirdparty/g2o core/block_solver.hpp). This kernel generates the
# indicator tiles in VMEM from the [P,N] landmark-id table instead: HBM
# traffic drops to O(P*N*C) per L-tile sweep (~16 MB total), and the MXU
# does the same contractions.

LBA_TL = 256      # landmark columns per grid step


def _lba_acc_kernel(ids_ref, vals_ref, out12_ref, perkf_ref):
    """One L-tile: for each keyframe p, mask = (tile_lm_ids == ids[p]),
    prod = mask @ vals[p]  ([TL,N] @ [N,C]); the first 12 channels
    (H_ll 9 + g_l 3) accumulate over p, the last 18 (H_pl) stay per-p."""
    gi = pl.program_id(0)
    P = ids_ref.shape[0]
    N = ids_ref.shape[1]
    C = vals_ref.shape[2]

    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (LBA_TL, N), 0) \
        + gi * LBA_TL

    def per_kf(p, acc12):
        ids = ids_ref[p, :]                              # [N]
        mask = (tile_ids == ids[None, :]).astype(jnp.float32)
        prod = jax.lax.dot_general(
            mask, vals_ref[p], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [TL,C]
        perkf_ref[p, :, :] = prod[:, 12:]
        return acc12 + prod[:, :12]

    out12_ref[:] = jax.lax.fori_loop(
        0, P, per_kf, jnp.zeros((LBA_TL, 12), jnp.float32))


@partial(jax.jit, static_argnames=("L", "interpret"))
def lba_landmark_blocks(row_lm, vals, L: int, interpret: bool = False):
    """Fused landmark-block reduction for ba_solve.

    row_lm [P,N] int32: LOCAL landmark id per observation (-1 = invalid).
    vals [P,N,30] f32: per-observation [JtJ_l(9) | b_l(3) | JtJ_pl(18)].
    Returns (H_ll [L,3,3], g_l [L,3], H_pl [P,L,6,3]).
    L must be a multiple of LBA_TL and N a multiple of 128 (production
    caps are L=2048, N=1024; ba_solve pads otherwise).
    """
    P, N = row_lm.shape
    out12, perkf = pl.pallas_call(
        _lba_acc_kernel,
        grid=(L // LBA_TL,),
        in_specs=[pl.BlockSpec((P, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((P, N, 30), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((LBA_TL, 12), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((P, LBA_TL, 18), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((L, 12), jnp.float32),
                   jax.ShapeDtypeStruct((P, L, 18), jnp.float32)],
        interpret=interpret,
    )(row_lm, vals)
    H_ll = out12[:, :9].reshape(L, 3, 3)
    g_l = out12[:, 9:12]
    H_pl = perkf.reshape(P, L, 6, 3)
    return H_ll, g_l, H_pl


def lba_landmark_blocks_xla(row_lm, vals, L):
    """XLA oracle (one-hot matmuls) — CPU fallback and kernel test
    reference; numerics match ba_solve's original einsum formulation."""
    P, N = row_lm.shape
    ok = row_lm >= 0
    onehot = ((jnp.where(ok, row_lm, L)[:, :, None] ==
               jnp.arange(L, dtype=row_lm.dtype)[None, None, :])
              ).astype(jnp.float32)
    out = jnp.einsum('pnl,pnc->plc', onehot, vals,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)   # [P,L,30]
    H_ll = jnp.sum(out[..., :9], axis=0).reshape(L, 3, 3)
    g_l = jnp.sum(out[..., 9:12], axis=0)
    H_pl = out[..., 12:].reshape(P, L, 6, 3)
    return H_ll, g_l, H_pl
