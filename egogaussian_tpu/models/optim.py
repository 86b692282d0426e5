"""Per-field Adam with moment surgery and the 3DGS LR schedules.

TPU-native redesign of the reference's torch.optim.Adam usage
(`scene/gaussian_model.py:180-223` training_setup; per-stage variants
:762-878; optimizer state surgery :225-273,506-536). Hand-rolled so that:
  * learning rates are per-field *step arguments* (not optimizer rebuilds),
    expressing the reference's warm-up/densify/restore LR choreography
    (coarse_obj_pose.py:178-193) inside one jitted step (SURVEY.md §7 #4);
  * first/second moments are plain pytrees mirroring the params, so
    densify/prune/opacity-reset can zero or drop moments exactly like
    `cat_tensors_to_optimizer` / `_prune_optimizer` /
    `replace_tensor_to_optimizer` (moment-zeroing on reset is load-bearing
    for matching training dynamics).

Adam hyperparameters match the reference: betas=(0.9, 0.999), eps=1e-15.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Any  # pytree mirroring params
    nu: Any  # pytree mirroring params
    count: jnp.ndarray  # scalar int32 step count


def adam_init(params: Any) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(
        mu=zeros,
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr_tree: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step. `lr_tree` is a pytree of scalars with the same structure
    as `params` (or a broadcastable prefix via tree_map), letting each field
    carry its own (possibly scheduled, possibly zero) learning rate."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1**c
    bc2 = 1.0 - b2**c

    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(
        lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, grads
    )

    def upd(p, m, v, lr):
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree_util.tree_map(upd, params, mu, nu, lr_tree)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def zero_moments_where(state: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero Adam moments at masked rows across every field (surgery for new /
    reset Gaussians; reference cat_tensors_to_optimizer:243-273 and
    replace_tensor_to_optimizer:225-241 semantics)."""

    def z(x):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(bool)
        return jnp.where(m, 0.0, x)

    return dataclasses.replace(
        state,
        mu=jax.tree_util.tree_map(z, state.mu),
        nu=jax.tree_util.tree_map(z, state.nu),
    )


def zero_moments_field(state: AdamState, field: str) -> AdamState:
    """Zero moments for one named field of a dataclass-params pytree
    (opacity reset path)."""
    mu = dataclasses.replace(
        state.mu, **{field: jnp.zeros_like(getattr(state.mu, field))}
    )
    nu = dataclasses.replace(
        state.nu, **{field: jnp.zeros_like(getattr(state.nu, field))}
    )
    return dataclasses.replace(state, mu=mu, nu=nu)


def expon_lr(
    step: jnp.ndarray,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
) -> jnp.ndarray:
    """Log-linear LR schedule from Plenoxels, used for xyz
    (reference utils/general_utils.py:75-108 get_expon_lr_func).
    Jit-friendly: `step` may be traced."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        math.log(max(lr_init, 1e-32)) * (1 - t) + math.log(max(lr_final, 1e-32)) * t
    )
    out = delay_rate * log_lerp
    # reference returns 0.0 for step<0 or lr_init==lr_final==0
    return jnp.where(step < 0, 0.0, out)


def gaussian_lr_tree(
    params_like: Any,
    step: jnp.ndarray,
    opt,
    spatial_lr_scale: float,
    divider: float = 1.0,
    xyz_scale: float = 1.0,
    label_lr: float | None = None,
    zero_gaussians: bool = False,
) -> Any:
    """Build the per-field LR pytree for GaussianParams from an
    OptimizationParams-style config (reference training_setup,
    gaussian_model.py:180-223 + per-stage dividers :762-878).

    Args:
      divider: stage LR divider (e.g. coarse stage uses /10,
        gaussian_model.py:810-849)
      xyz_scale: extra multiplier for xyz lr (densify-window games)
      zero_gaussians: zero every field (pose-only phases;
        zero_gaussians_lr :851-860)
    """
    xyz_lr = expon_lr(
        step,
        opt.position_lr_init * spatial_lr_scale / divider,
        opt.position_lr_final * spatial_lr_scale / divider,
        lr_delay_steps=0,
        lr_delay_mult=getattr(opt, "position_lr_delay_mult", 0.01),
        max_steps=getattr(opt, "position_lr_max_steps", 30000),
    ) * xyz_scale
    lrs = dict(
        xyz=xyz_lr,
        features_dc=opt.feature_lr / divider,
        features_rest=opt.feature_lr / 20.0 / divider,
        log_scales=opt.scaling_lr / divider,
        quats=opt.rotation_lr / divider,
        opacity_logit=opt.opacity_lr / divider,
        label=(label_lr if label_lr is not None else opt.label_lr) / divider,
    )
    if zero_gaussians:
        lrs = {k: 0.0 for k in lrs}
    return dataclasses.replace(
        jax.tree_util.tree_map(lambda x: 0.0, params_like),
        **{k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()},
    )
