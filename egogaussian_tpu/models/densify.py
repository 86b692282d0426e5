"""Densification and pruning as fixed-shape masked scatters.

TPU-native redesign of reference `scene/gaussian_model.py:588-748`
(densify_and_split / densify_and_clone / densify_and_prune /
add_densification_stats) and the opacity resets (:485-501). The reference
concatenates/prunes tensors (dynamic shapes + Adam-state surgery); here the
capacity is fixed and everything is a masked write:

  * clone candidates  = copy of selected rows
  * split candidates  = 2 rows sampled from the parent's anisotropic Gaussian,
    scales /(0.8*2); the parent is killed
  * candidates are scattered into dead slots found by ranking `~alive`;
    overflow beyond free capacity is dropped (reported in the result)
  * pruning just clears `alive`
  * Adam moments of filled slots are zeroed (cat_tensors_to_optimizer
    semantics); dead rows' moments are zeroed so they cannot leak back in.

All functions are jit-safe at fixed capacity.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from egogaussian_tpu.models.gaussians import GaussianModel, GaussianParams, GaussianAux
from egogaussian_tpu.models.optim import AdamState, zero_moments_where
from egogaussian_tpu.ops.quaternion import quat_to_rotmat


class DensifyResult(NamedTuple):
    model: GaussianModel
    opt_state: AdamState
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    overflow: jnp.ndarray  # candidates dropped for lack of free capacity


def add_densification_stats(
    model: GaussianModel, means2d_grad: jnp.ndarray, radii: jnp.ndarray
) -> GaussianModel:
    """Accumulate screen-space gradient norms for visible Gaussians
    (reference add_densification_stats, gaussian_model.py:735-740; the
    visibility filter is radii>0, gaussian_renderer/__init__.py:104)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    aux = dataclasses.replace(
        model.aux,
        xyz_gradient_accum=model.aux.xyz_gradient_accum
        + jnp.where(visible, gnorm, 0.0),
        denom=model.aux.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(
            model.aux.max_radii2d, jnp.where(visible, radii.astype(jnp.float32), 0.0)
        ),
    )
    return dataclasses.replace(model, aux=aux)


def _scatter_rows(dst: jnp.ndarray, slot_idx: jnp.ndarray, src: jnp.ndarray,
                  ok: jnp.ndarray) -> jnp.ndarray:
    """Write src rows into dst at slot_idx where ok (drop otherwise)."""
    safe_idx = jnp.where(ok, slot_idx, dst.shape[0])  # OOB drops in jax scatter
    return dst.at[safe_idx].set(src, mode="drop")


def densify_and_prune(
    model: GaussianModel,
    opt_state: AdamState,
    rng: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: Optional[float],
    percent_dense: float = 0.01,
    clone: bool = True,
    split: bool = True,
    curr_gen: Optional[int] = None,
    prune_prev_gen: bool = True,
    split_prev_gen: bool = True,
    which_object: Optional[int] = None,
) -> DensifyResult:
    """One densify+prune pass (reference densify_and_prune,
    gaussian_model.py:679-712, incl. the generation/object filters used by
    the coarse/fine object stages). Resets the densification stats after,
    like densification_postfix (:579-581)."""
    p, a = model.params, model.aux
    C = p.xyz.shape[0]
    alive = a.alive

    grads = a.xyz_gradient_accum / jnp.maximum(a.denom, 1e-12)
    grads = jnp.where(jnp.isnan(grads) | (a.denom == 0), 0.0, grads)
    scaling = jnp.exp(p.log_scales)
    max_scale = jnp.max(scaling, axis=1)

    base_sel = alive & (grads >= max_grad)
    if which_object is not None:
        base_sel = base_sel & (a.is_object == which_object)

    clone_sel = base_sel & (max_scale <= percent_dense * extent)
    split_sel = base_sel & (max_scale > percent_dense * extent)
    if not split_prev_gen:
        assert curr_gen is not None
        split_sel = split_sel & (a.generation == curr_gen)
    if not clone:
        clone_sel = jnp.zeros_like(clone_sel)
    if not split:
        split_sel = jnp.zeros_like(split_sel)

    new_gen_of = (
        a.generation if curr_gen is None else jnp.full_like(a.generation, curr_gen)
    )

    # ---- candidate construction (fixed shape [3C] = C clones + 2C splits) --
    # clone candidates: identical copies
    # split candidates: xyz + R(q) @ N(0, diag(s)); scales /(0.8*2)
    #
    # The noise is drawn per SLOT from a fold_in-derived key, NOT as one
    # (2, C, 3) draw: a counter-based draw ties each slot's values to the
    # padded capacity C, so the same logical scene densifies DIFFERENTLY at
    # different capacities (r5 root-cause of the never-green lockstep-vs-
    # individual fine-driver equivalence: the lockstep pads to the shared
    # max capacity while an individual run may still be pre-growth, and the
    # split children landed at different positions). Capacity must stay an
    # implementation detail — per-slot keys make the draw depend only on
    # (base key, slot index).
    row_keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
        jnp.arange(C, dtype=jnp.uint32)
    )
    samples = jax.vmap(lambda k: jax.random.normal(k, (2, 3)))(row_keys)
    samples = samples.transpose(1, 0, 2) * scaling[None]  # [2, C, 3]
    R = quat_to_rotmat(p.quats)  # [C, 3, 3]
    offsets = jnp.einsum("cij,ncj->nci", R, samples)  # [2, C, 3]
    split_xyz = p.xyz[None] + offsets  # [2, C, 3]
    split_log_scales = jnp.log(scaling / (0.8 * 2.0))

    def cand(field_clone, field_split):
        return jnp.concatenate(
            [field_clone, field_split, field_split], axis=0
        )

    cand_params = GaussianParams(
        xyz=jnp.concatenate([p.xyz, split_xyz[0], split_xyz[1]], axis=0),
        features_dc=cand(p.features_dc, p.features_dc),
        features_rest=cand(p.features_rest, p.features_rest),
        log_scales=jnp.concatenate(
            [p.log_scales, split_log_scales, split_log_scales], axis=0
        ),
        quats=cand(p.quats, p.quats),
        opacity_logit=cand(p.opacity_logit, p.opacity_logit),
        label=cand(p.label, p.label),
    )
    cand_gen = jnp.concatenate([new_gen_of, new_gen_of, new_gen_of], axis=0)
    cand_is_obj = jnp.tile(a.is_object, 3)
    cand_mask = jnp.concatenate([clone_sel, split_sel, split_sel], axis=0)  # [3C]

    # ---- prune mask (applied to existing rows) ----
    opacity = jax.nn.sigmoid(p.opacity_logit[:, 0])
    prune_mask = opacity < min_opacity
    if max_screen_size is not None:
        prune_mask = (
            prune_mask
            | (a.max_radii2d > max_screen_size)
            | (max_scale > 0.1 * extent)
        )
    if not prune_prev_gen:
        assert curr_gen is not None
        prune_mask = prune_mask & (a.generation == curr_gen)
    prune_mask = (prune_mask | split_sel) & alive  # split parents die

    alive_after_prune = alive & ~prune_mask

    # ---- slot assignment: rank candidates, map to free slots ----
    free = ~alive_after_prune  # [C]
    # free_slots[r] = index of the r-th free slot
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    num_free = jnp.sum(free.astype(jnp.int32))
    free_slots = jnp.full((C,), C, jnp.int32).at[
        jnp.where(free, free_rank, C)
    ].set(jnp.arange(C, dtype=jnp.int32), mode="drop")

    cand_rank = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1  # [3C]
    fits = cand_mask & (cand_rank < num_free)
    slot_of_cand = free_slots[jnp.clip(cand_rank, 0, C - 1)]

    new_params = GaussianParams(
        **{
            f.name: _scatter_rows(
                getattr(p, f.name), slot_of_cand, getattr(cand_params, f.name), fits
            )
            for f in dataclasses.fields(p)
        }
    )
    new_alive = alive_after_prune.at[jnp.where(fits, slot_of_cand, C)].set(
        True, mode="drop"
    )
    new_generation = _scatter_rows(a.generation, slot_of_cand, cand_gen, fits)
    new_is_object = _scatter_rows(a.is_object, slot_of_cand, cand_is_obj, fits)

    new_aux = GaussianAux(
        alive=new_alive,
        generation=new_generation,
        is_object=new_is_object,
        # postfix resets stats for ALL points (gaussian_model.py:579-581)
        max_radii2d=jnp.zeros_like(a.max_radii2d),
        xyz_gradient_accum=jnp.zeros_like(a.xyz_gradient_accum),
        denom=jnp.zeros_like(a.denom),
    )

    # moments: zero for any slot whose occupant changed (new fills) or died
    changed = ~new_alive | (new_alive & ~alive_after_prune)
    new_opt_state = zero_moments_where(opt_state, changed)

    num_cloned = jnp.sum((fits & (jnp.arange(3 * C) < C)).astype(jnp.int32))
    num_split = jnp.sum((fits & (jnp.arange(3 * C) >= C)).astype(jnp.int32))
    overflow = jnp.sum((cand_mask & ~fits).astype(jnp.int32))
    num_pruned = jnp.sum(prune_mask.astype(jnp.int32))

    return DensifyResult(
        model=dataclasses.replace(model, params=new_params, aux=new_aux),
        opt_state=new_opt_state,
        num_cloned=num_cloned,
        num_split=num_split,
        num_pruned=num_pruned,
        overflow=overflow,
    )


def reset_opacity(
    model: GaussianModel,
    opt_state: AdamState,
    max_opacity: float = 0.01,
    which_object: Optional[int] = None,
):
    """Clamp opacities to <= max_opacity and zero the opacity moments
    (reference reset_opacity / reset_opacity_for_object,
    gaussian_model.py:485-501 + replace_tensor_to_optimizer moment zeroing)."""
    from egogaussian_tpu.models.optim import zero_moments_field

    p = model.params
    opacity = jax.nn.sigmoid(p.opacity_logit)
    new_op = jnp.minimum(opacity, max_opacity)
    new_logit = jnp.log(new_op / (1.0 - new_op))
    if which_object is not None:
        m = (model.aux.is_object == which_object)[:, None]
        new_logit = jnp.where(m, new_logit, p.opacity_logit)
    new_params = dataclasses.replace(p, opacity_logit=new_logit)
    return (
        dataclasses.replace(model, params=new_params),
        zero_moments_field(opt_state, "opacity_logit"),
    )


def prune_by_opacity(
    model: GaussianModel,
    opt_state: AdamState,
    min_opacity: float,
):
    """Standalone opacity pruning (reference train_static.py:146-150 prunes
    opacity<0.5 after the entropy phase)."""
    opacity = jax.nn.sigmoid(model.params.opacity_logit[:, 0])
    prune = model.aux.alive & (opacity < min_opacity)
    new_alive = model.aux.alive & ~prune
    aux = dataclasses.replace(model.aux, alive=new_alive)
    opt_state = zero_moments_where(opt_state, ~new_alive)
    return dataclasses.replace(model, aux=aux), opt_state, jnp.sum(prune)
