"""Frame-data-parallel training step.

Each device renders a different camera of the batch against replicated
Gaussian parameters; the photometric loss is averaged across the batch, so
the parameter gradients are an all-reduce (psum) over the data axis —
emitted by XLA from the shardings, riding ICI (SURVEY.md §2.3 consequence
table). This is the TPU replacement for the reference's one-frame-per-step
host loop (train_static.py:68) AND its job-level parallelism.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egogaussian_tpu.data.readers import FrameBatch
from egogaussian_tpu.models.gaussians import GaussianModel
from egogaussian_tpu.models.optim import adam_update
from egogaussian_tpu.train.common import image_loss, mask_grad, render_gaussians


def _per_frame_loss(model, batch, f, lambda_dssim, backend):
    cam, gt, hand, _ = batch.frame(f)
    res = render_gaussians(
        model, cam, jnp.zeros(3, model.params.xyz.dtype), backend=backend
    )
    img = mask_grad(res.image, hand)
    return image_loss(img, gt, lambda_dssim)


def data_parallel_train_step(
    model: GaussianModel,
    opt_state,
    batch: FrameBatch,
    frame_idxs: jnp.ndarray,  # [B] frame indices, B sharded over "data"
    lr_tree,
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
):
    """One step over a batch of frames. Designed to be jitted with
    `frame_idxs` (and per-frame gathered data) sharded over the data axis
    and (model, opt_state) replicated — grads psum automatically."""

    def loss_fn(params):
        m = dataclasses.replace(model, params=params)
        losses = jax.vmap(
            lambda f: _per_frame_loss(m, batch, f, lambda_dssim, backend)
        )(frame_idxs)
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    new_params, new_opt = adam_update(model.params, grads, opt_state, lr_tree)
    return dataclasses.replace(model, params=new_params), new_opt, loss


def make_dp_train_step(
    mesh: Mesh, lambda_dssim: float = 0.2, backend: str = "tiled"
):
    """Bind a mesh: returns a jitted step with explicit in/out shardings
    (model/opt replicated, frame batch sharded on "data")."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    step = functools.partial(
        data_parallel_train_step, lambda_dssim=lambda_dssim, backend=backend
    )
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, shard, repl),
        out_shardings=(repl, repl, repl),
    )
