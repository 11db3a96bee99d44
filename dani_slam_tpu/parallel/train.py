"""Distributed training of the learned front-end.

The reference consumes pre-trained LibTorch checkpoints (withheld from its
repo — hard-coded external paths, SURVEY.md §5); this module is the
TPU-native path to producing those weights: a SuperPoint self-supervision
step (homographic-warp detector repeatability + descriptor consistency),
sharded data-parallel x tensor-parallel over a jax Mesh. It is exercised by
`__graft_entry__.dryrun_multichip` on a virtual device mesh.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dani_slam_tpu.models.superpoint import SuperPoint


def make_mesh_2d(n_devices: int) -> Mesh:
    if n_devices >= 4:
        shape = (n_devices // 2, 2)
    else:
        shape = (n_devices, 1)
    devs = np.asarray(jax.devices()[:n_devices]).reshape(shape)
    return Mesh(devs, ("data", "model"))


def shard_params(params, mesh: Mesh):
    """Conv kernels split on output channels over 'model' (tensor
    parallelism); everything else replicated. GSPMD propagates the layout
    through the network."""
    def spec(p):
        if hasattr(p, "ndim") and p.ndim == 4 and \
                p.shape[-1] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if hasattr(p, "ndim") and p.ndim == 1 and \
                p.shape[0] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda p: jax.device_put(p, spec(p)),
                                  params)


def warp_loss(model: SuperPoint, params, batch: jax.Array,
              shift: Tuple[int, int] = (4, 0)) -> jax.Array:
    """Self-supervision: the detector heatmap and descriptors of a shifted
    image must match the shifted heatmap/descriptors of the original
    (homographic-adaptation consistency, pure-translation special case —
    differentiable and label-free)."""
    dy, dx = shift
    heat, desc = model.apply(params, batch)
    shifted = jnp.roll(batch, (dy, dx), axis=(1, 2))
    heat_s, desc_s = model.apply(params, shifted)
    det = jnp.mean((jnp.roll(heat, (dy, dx), axis=(1, 2)) - heat_s) ** 2)
    dsc = jnp.mean((jnp.roll(desc, (dy // 8, dx // 8), axis=(1, 2))
                    - desc_s) ** 2)
    # entropy prior keeps the detector from collapsing to uniform
    ent = -jnp.mean(heat * jnp.log(heat + 1e-9))
    return det + 0.1 * dsc + 1e-3 * ent


def make_train_step(model: SuperPoint, opt):
    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: warp_loss(model, p, batch))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss
    return step


def train_superpoint_sharded(n_devices: int, steps: int = 1,
                             batch: int | None = None, hw=(32, 32),
                             lr: float = 1e-4):
    """Run `steps` of the sharded training step; returns final loss."""
    mesh = make_mesh_2d(n_devices)
    model = SuperPoint(compute_dtype=jnp.float32)
    B = batch or mesh.shape["data"] * 2
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, hw[0], hw[1], 1))
    params = model.init(jax.random.PRNGKey(1), x)
    opt = optax.adam(lr)
    with mesh:
        params = shard_params(params, mesh)
        opt_state = jax.tree_util.tree_map(
            lambda p: jax.device_put(p, NamedSharding(mesh, P()))
            if hasattr(p, "shape") else p, opt.init(params))
        x = jax.device_put(x, NamedSharding(mesh, P("data")))
        step = make_train_step(model, opt)
        loss = None
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, x)
        loss.block_until_ready()
    return params, float(loss)
