"""Micro-benchmarks: scatter vs scatterless formulations (closure-based so
no per-call arg staging pollutes the numbers; ~1 ms dispatch floor)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")


def timeit(name, fn, reps=30):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    N, L, B = 1024, 32768, 1024

    bind = jnp.asarray(rng.randint(-1, L, (N,)), jnp.int32)
    ok = bind >= 0
    ids = jnp.where(ok, bind, 0)

    @jax.jit
    def noop():
        return bind + 1
    timeit("dispatch floor (1 add)", noop)

    @jax.jit
    def seen_scatter():
        return jnp.zeros((L,), bool).at[ids].max(ok)
    timeit("seen: scatter-max 1024 -> [L]", seen_scatter)

    @jax.jit
    def seen_compare():
        iota = jnp.arange(L, dtype=jnp.int32)
        return jnp.any((iota[:, None] == ids[None, :]) & ok[None, :], axis=1)
    timeit("seen: compare-reduce [L,1024]", seen_compare)

    @jax.jit
    def seen_compare_sum():
        # histogram variant
        iota = jnp.arange(L, dtype=jnp.int32)
        return jnp.sum(((iota[:, None] == ids[None, :]) & ok[None, :])
                       .astype(jnp.int32), axis=1)
    timeit("count: compare-reduce [L,1024]", seen_compare_sum)

    @jax.jit
    def seen_matmul():
        # one-hot matmul variant (MXU)
        oh = (ids[:, None] ==
              jnp.arange(L, dtype=jnp.int32)[None, :]) & ok[:, None]
        return jnp.sum(oh.astype(jnp.bfloat16), axis=0) > 0
    timeit("seen: onehot-sum bf16", seen_matmul)

    # [N]-target scatter vs compare
    idxs = jnp.asarray(rng.randint(0, N, (N,)), jnp.int32)
    vals = jnp.asarray(rng.randint(0, L, (N,)), jnp.int32)

    @jax.jit
    def bind_scatter():
        b = jnp.full((N,), -1, jnp.int32)
        return b.at[jnp.where(ok, idxs, N - 1)].max(jnp.where(ok, vals, -1))
    timeit("bind: scatter-max 1024 -> [N]", bind_scatter)

    @jax.jit
    def bind_compare():
        iota = jnp.arange(N, dtype=jnp.int32)
        m = (iota[:, None] == idxs[None, :]) & ok[None, :]
        return jnp.max(jnp.where(m, vals[None, :], -1), axis=1)
    timeit("bind: compare-reduce [N,N]", bind_compare)

    # insert_landmarks: 11-field scatter vs cumsum-gather
    lm_mask = jnp.asarray(rng.rand(L) < 0.3)
    pos = jnp.asarray(rng.randn(B, 3), jnp.float32)
    desc = jnp.asarray(rng.randn(B, 256), jnp.float32)
    valid = jnp.asarray(rng.rand(B) < 0.5)
    old_pos = jnp.zeros((L, 3))
    old_desc = jnp.zeros((L, 256))

    @jax.jit
    def insert_scatter():
        free = ~lm_mask
        idx = jnp.arange(L, dtype=jnp.int32)
        key = jnp.where(free, idx, L + idx)
        slots = jnp.argsort(key)[:B]
        can = valid & ~lm_mask[slots]
        p = old_pos.at[slots].set(jnp.where(can[:, None], pos, old_pos[slots]))
        d = old_desc.at[slots].set(
            jnp.where(can[:, None], desc, old_desc[slots]))
        m = lm_mask.at[slots].set(can | lm_mask[slots])
        return p, d, m
    timeit("insert: argsort + 3-field scatter", insert_scatter)

    @jax.jit
    def insert_cumsum():
        free = ~lm_mask
        rank = jnp.cumsum(free.astype(jnp.int32)) - free.astype(jnp.int32)
        recv = free & (rank < B)
        src = jnp.where(recv, rank, 0)
        can_row = recv & jnp.take(valid, src)
        p = jnp.where(can_row[:, None], pos[src], old_pos)
        d = jnp.where(can_row[:, None], desc[src], old_desc)
        m = lm_mask | can_row
        return p, d, m
    timeit("insert: cumsum-gather 3 fields", insert_cumsum)

    # resolve_duplicate_targets dense rewrite
    dist = jnp.asarray(rng.rand(N, N), jnp.float32)
    midx = jnp.asarray(rng.randint(0, N, (N,)), jnp.int32)
    mok = jnp.asarray(rng.rand(N) < 0.5)
    mdist = jnp.asarray(rng.rand(N), jnp.float32)

    @jax.jit
    def resolve_scatter():
        tgt = jnp.where(mok, midx, N)
        best = jnp.full((N + 1,), jnp.inf).at[tgt].min(
            jnp.where(mok, mdist, jnp.inf))
        keep = mok & (mdist <= jnp.take(best, tgt))
        order = jnp.where(keep, jnp.arange(N), N)
        first = jnp.full((N + 1,), N, jnp.int32).at[tgt].min(
            order.astype(jnp.int32))
        keep &= jnp.take(first, tgt) == jnp.arange(N)
        return keep
    timeit("resolve-dup: 2 scatters", resolve_scatter)

    @jax.jit
    def resolve_dense():
        iota = jnp.arange(N, dtype=jnp.int32)
        m = (iota[None, :] == midx[:, None]) & mok[:, None]   # [q,t]
        d = jnp.where(m, mdist[:, None], jnp.inf)
        win = jnp.argmin(d, axis=0)                          # per target
        keep = mok & (jnp.take(win, midx) == iota)
        return keep
    timeit("resolve-dup: dense [N,N] argmin", resolve_dense)


if __name__ == "__main__":
    main()
