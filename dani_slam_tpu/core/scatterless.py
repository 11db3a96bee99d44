"""Scatter-free reductions for TPU.

XLA:TPU lowers `x.at[ids].add/max/min` scatters to a slow sequential loop
(~1 ms per scatter instruction at SLAM sizes, regardless of row count) —
the single most expensive op class in the frame/keyframe programs. Every
helper here replaces a scatter with a dense compare-and-reduce: an
[size, B] comparison streamed through the VPU and reduced without
materializing (XLA fuses compare+reduce), O(size*B) throughput-bound work
instead of a serialized scatter. At B ~ 1024, size ~ 32768 this is ~33M
lane-ops ≈ 0.1-0.2 ms, a 5-10x win over the scatter, and it fuses with
neighbouring elementwise work.

Reference analogue: none — the reference mutates pointer graphs under
mutexes; these are the TPU-shaped primitives that replace per-object
mutation (SURVEY.md §2.4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def id_mask(ids: jax.Array, ok: jax.Array, size: int) -> jax.Array:
    """Bool [size]: out[s] = any(ok & (ids == s)). Replaces
    `zeros(size,bool).at[where(ok,ids,0)].max(ok)`."""
    iota = jnp.arange(size, dtype=ids.dtype)
    return jnp.any((iota[:, None] == ids[None, :]) & ok[None, :], axis=1)


def id_count(ids: jax.Array, ok: jax.Array, size: int) -> jax.Array:
    """Int32 [size]: out[s] = sum(ok & (ids == s)). Replaces
    `zeros(size,i32).at[where(ok,ids,0)].add(ok)` (histogram)."""
    iota = jnp.arange(size, dtype=ids.dtype)
    m = (iota[:, None] == ids[None, :]) & ok[None, :]
    return jnp.sum(m.astype(jnp.int32), axis=1)


def id_sum(ids: jax.Array, ok: jax.Array, vals: jax.Array,
           size: int) -> jax.Array:
    """[size]: out[s] = sum over j of vals[j] where ok[j] & ids[j]==s."""
    iota = jnp.arange(size, dtype=ids.dtype)
    m = (iota[:, None] == ids[None, :]) & ok[None, :]
    return jnp.sum(jnp.where(m, vals[None, :], 0), axis=1)


def id_max(ids: jax.Array, ok: jax.Array, vals: jax.Array, size: int,
           fill) -> jax.Array:
    """[size]: out[s] = max over j of vals[j] where ok[j] & ids[j]==s,
    `fill` where no j matches. Replaces `full(size,fill).at[ids].max(vals)`."""
    iota = jnp.arange(size, dtype=ids.dtype)
    m = (iota[:, None] == ids[None, :]) & ok[None, :]
    return jnp.max(jnp.where(m, vals[None, :], fill), axis=1)


def id_lookup(ids: jax.Array, ok: jax.Array, vals: jax.Array, size: int,
              default: jax.Array) -> jax.Array:
    """[size]: out[s] = vals[j*] for the FIRST j with ok[j] & ids[j]==s,
    else default[s]. Replaces `default.at[ids].set(vals)` when each id
    appears at most once (set semantics; first-j on duplicates)."""
    iota = jnp.arange(size, dtype=ids.dtype)
    m = (iota[:, None] == ids[None, :]) & ok[None, :]        # [size,B]
    j = jnp.argmax(m, axis=1)
    hit = jnp.any(m, axis=1)
    picked = jnp.take(vals, j, axis=0)
    if picked.ndim > 1:
        hit = hit.reshape(hit.shape + (1,) * (picked.ndim - 1))
    return jnp.where(hit, picked, default)


def scatter_rows_dense(free: jax.Array, cand_valid: jax.Array, B: int):
    """Placement plan for appending up to B candidate rows into the free
    slots of a mask (first-free-first), without a scatter.

    Returns (recv [size] bool — slot receives a candidate,
             src [size] int32 — candidate row index for receiving slots,
             placed [B] bool — candidate was placed).
    Slot s receives candidate r where r = rank of s among free slots
    (exclusive cumsum), matching core.state.free_slots order exactly.
    """
    freei = free.astype(jnp.int32)
    rank = jnp.cumsum(freei) - freei                     # exclusive
    recv = free & (rank < B)
    src = jnp.where(recv, rank, 0)
    recv = recv & jnp.take(cand_valid, src)
    n_free = jnp.sum(freei)
    placed = cand_valid & (jnp.arange(B) < n_free)
    return recv, src, placed
