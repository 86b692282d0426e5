"""Multi-scene batched training: several videos in one process, one mesh
row per scene.

The reference parallelizes across videos by launching separate SLURM jobs
(train.sh:13-19, one GPU each); here the same work is a single pjit program
over a (scene, data) mesh: models carry a leading scene axis sharded over
`scene`, each scene's frame batch is data-parallel over `data`, and XLA
keeps all collectives inside the mesh rows (BASELINE.json config 5,
SURVEY.md §2.3 consequence table).

All scenes must share static shapes (Gaussian capacity, image size, frame
count) — pad to the max like any batched workload.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egogaussian_tpu.data.readers import FrameBatch
from egogaussian_tpu.models.gaussians import GaussianModel
from egogaussian_tpu.models.optim import adam_update
from egogaussian_tpu.parallel.data_parallel import _per_frame_loss


def stack_scenes(items: Sequence):
    """Stack identically-shaped pytrees (models / opt states / FrameBatches)
    along a new leading scene axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *items)


def unstack_scenes(tree, n: int):
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], tree) for i in range(n)
    ]


def multi_scene_train_step(
    models: GaussianModel,  # leading scene axis on every leaf
    opt_states,
    batches: FrameBatch,  # [S, F, ...]
    frame_idxs: jnp.ndarray,  # [S, B]
    lr_trees,  # leading scene axis (or replicated scalars broadcast)
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
):
    """One step for S scenes x B frames each. vmapped over scenes; inside,
    each scene averages its loss over B frames (data-parallel when the B
    axis is sharded)."""

    def one_scene(model, opt_state, batch, fidx, lr_tree):
        def loss_fn(params):
            m = dataclasses.replace(model, params=params)
            losses = jax.vmap(
                lambda f: _per_frame_loss(m, batch, f, lambda_dssim, backend)
            )(fidx)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(model.params)
        new_params, new_opt = adam_update(model.params, grads, opt_state, lr_tree)
        return dataclasses.replace(model, params=new_params), new_opt, loss

    return jax.vmap(one_scene)(models, opt_states, batches, frame_idxs, lr_trees)


def make_multi_scene_step(
    mesh: Mesh, lambda_dssim: float = 0.2, backend: str = "tiled"
):
    """Jitted multi-scene step with explicit shardings: every scene-stacked
    input sharded over the `scene` mesh axis."""
    scene_sharded = NamedSharding(mesh, P("scene"))

    step = functools.partial(
        multi_scene_train_step, lambda_dssim=lambda_dssim, backend=backend
    )
    return jax.jit(
        step,
        in_shardings=(
            scene_sharded, scene_sharded, scene_sharded, scene_sharded,
            scene_sharded,
        ),
        out_shardings=(scene_sharded, scene_sharded, scene_sharded),
    )
