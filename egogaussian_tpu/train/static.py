"""Stage 1.0 (static phases) and Stage 1.2 (background) trainers.

Behavioral twin of reference `trainers/train_static.py` and
`trainers/train_static_bg.py`, re-architected for TPU: one jitted step
function per loss mode (std / entropy / label), frames gathered from a
device-resident FrameBatch by traced index, densify/prune as jitted
fixed-shape passes with host-side capacity growth.

Stage summary (reference train_static.py:16-207):
  per static phase, re-initialized from the COLMAP point cloud:
    iters 1..std:            0.8*L1 + 0.2*(1-SSIM), hand-grad-masked
    iters std..std+entropy:  + 0.1 * opacity entropy of visible Gaussians
      (then prune opacity < 0.5 and shrink to `rewind_frames` frames)
    iters ..+label:          BCE(label render, obj mask), all LRs zero
      except label (update_lr_for_label, gaussian_model.py:204-210)
  densify/prune every 100 iters in [500, 40k], opacity reset every 3k.
  outputs: full/object/background PLYs + predicted object masks rendered
  from the thresholded label for every static frame.

Stage 1.2 (train_static_bg.py:23-173): same std+entropy loop, but the
gradient mask is hand OR object dilated by 5 px, trained over ALL phases'
frames at once, no label phase.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.config import Config
from egogaussian_tpu.data.readers import FrameBatch, dilate_mask, stack_cameras
from egogaussian_tpu.models.densify import (
    densify_and_prune,
    prune_by_opacity,
    reset_opacity,
)
from egogaussian_tpu.models.gaussians import (
    GaussianModel,
    compact,
    ensure_capacity,
    from_points,
    save_ply,
)
from egogaussian_tpu.models.optim import adam_init, adam_update, gaussian_lr_tree
from egogaussian_tpu.ops.losses import bce_with_logits
from egogaussian_tpu.train.common import (
    auto_tile_config,
    image_loss,
    maybe_regrow_tile_config,
    pick_backend,
    mask_grad,
    model_colors,
    opacity_entropy,
    render_gaussians,
    render_label_image,
)
from egogaussian_tpu.utils.console import CONSOLE
from egogaussian_tpu.utils.logging import log_metrics


# frame batches up to this size are unrolled in the step graph instead of
# lax.scan'd (independent frames overlap; compile time grows with K)
_FB_UNROLL_MAX = 8


def _frames_loss_grads(
    model: GaussianModel,
    batch: FrameBatch,
    fidxs: jnp.ndarray,  # [K] int32 frame indices
    grad_masks: jnp.ndarray,
    mode: str,
    lambda_dssim: float,
    backend: str,
    tile_config,
    bg: jnp.ndarray,
):
    """Gradient of the MEAN loss over `fidxs` w.r.t. (params, means2d probe).

    Shared by the single-device step (`_static_step`, lax.scan over frames)
    and the frame-data-parallel step (`_dp_static_step`, each device scans
    its local shard and psums). Returns
    (param_grads, probe_grads [K,cap,2], losses [K], radii [K,cap],
    dropped [K])."""
    n_frames = fidxs.shape[0]
    probe = jnp.zeros((n_frames, model.capacity, 2), model.params.xyz.dtype)

    def loss_fn(params, probe):
        m = dataclasses.replace(model, params=params)

        def one_frame(_, xs):
            f, probe_f = xs
            cam, gt, _, obj_mask = batch.frame(f)
            grad_mask = FrameBatch.decode_mask(grad_masks[f])
            if mode == "label":
                from egogaussian_tpu.render.api import render as render_api

                # one render: label as the color channel with detached
                # geometry (get_render_label twin); its radii ARE the
                # visibility filter — no second RGB render needed
                sg = jax.lax.stop_gradient
                res = render_api(
                    cam, sg(m.params.xyz), sg(m.covariance()), sg(m.opacity),
                    bg=jnp.zeros((1,), m.params.xyz.dtype),
                    colors_precomp=m.params.label,
                    valid_mask=m.aux.alive, backend=backend,
                    tile_config=tile_config,
                )
                label_img = mask_grad(res.image, grad_mask)
                loss = bce_with_logits(label_img, obj_mask)
                return 0, (loss, res.radii, res.dropped_pairs)
            res = render_gaussians(m, cam, bg, means2d_probe=probe_f,
                                   backend=backend, tile_config=tile_config)
            img = mask_grad(res.image, grad_mask)
            loss = image_loss(img, gt, lambda_dssim)
            if mode == "entropy":
                loss = loss + 0.1 * opacity_entropy(
                    m.params.opacity_logit[:, 0], res.radii > 0
                )
            return 0, (loss, res.radii, res.dropped_pairs)

        if n_frames == 1:
            # inline single-frame path: no scan wrapper in the hot graph
            _, (loss, radii, dropped) = one_frame(0, (fidxs[0], probe[0]))
            losses = loss[None]
            radii, dropped = radii[None], dropped[None]
        elif n_frames <= _FB_UNROLL_MAX:
            # small batches are UNROLLED: the frames are independent, so
            # without the scan's sequential carry XLA is free to overlap
            # frame A's pair gathers with frame B's kernel (the scan path
            # measured ~12% slower per frame than standalone steps)
            outs = [
                one_frame(0, (fidxs[k], probe[k]))[1]
                for k in range(n_frames)
            ]
            losses = jnp.stack([o[0] for o in outs])
            radii = jnp.stack([o[1] for o in outs])
            dropped = jnp.stack([o[2] for o in outs])
        else:
            _, (losses, radii, dropped) = jax.lax.scan(
                one_frame, 0, (fidxs, probe)
            )
        return jnp.mean(losses), (radii, losses, dropped)

    grads, (radii, losses, dropped) = jax.grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(model.params, probe)
    return grads[0], grads[1], losses, radii, dropped


def _probe_stats(batch, probe_grads, radii, undo_mean_k):
    """Densification-statistic contributions of a frame set, reduced over
    the frame axis. Summation order differs from K sequential
    `add_densification_stats` calls only by float reassociation.

    The reference accumulates screen-space gradients in NDC units (the CUDA
    backward scales dL/dmean2D by W/2, H/2); the probe is in pixels, so
    rescale — otherwise the tuned densify_grad_threshold (2e-4)
    under-triggers by ~W/2 at any resolution. `undo_mean_k` undoes the
    1/K of the mean loss so each frame contributes the same statistic as a
    standalone reference iteration."""
    dtype = probe_grads.dtype
    ndc_scale = jnp.array([batch.width * 0.5, batch.height * 0.5], dtype)
    g = probe_grads * (ndc_scale * undo_mean_k)
    gnorm = jnp.linalg.norm(g[..., :2], axis=-1)  # [K, cap]
    visible = radii > 0
    gn_sum = jnp.sum(jnp.where(visible, gnorm, 0.0), axis=0)
    den_sum = jnp.sum(visible.astype(jnp.float32), axis=0)
    rad_max = jnp.max(
        jnp.where(visible, radii.astype(jnp.float32), 0.0), axis=0
    )
    return gn_sum, den_sum, rad_max


def _apply_probe_stats(model, gn_sum, den_sum, rad_max):
    """Fold reduced densification statistics into the model aux
    (add_densification_stats semantics, applied once per step)."""
    aux = dataclasses.replace(
        model.aux,
        xyz_gradient_accum=model.aux.xyz_gradient_accum + gn_sum,
        denom=model.aux.denom + den_sum,
        max_radii2d=jnp.maximum(model.aux.max_radii2d, rad_max),
    )
    return dataclasses.replace(model, aux=aux)


def _static_lr_tree(model, it, opt_cfg, mode, label_lr):
    """Per-field LR tree for the static step, computed IN-JIT from the
    traced iteration counter (see `_static_step` docstring)."""
    if mode == "label":
        lr_tree = gaussian_lr_tree(
            model.params, it, opt_cfg, model.spatial_lr_scale,
            zero_gaussians=True,
        )
        return dataclasses.replace(lr_tree, label=jnp.float32(label_lr))
    return gaussian_lr_tree(
        model.params, it, opt_cfg, model.spatial_lr_scale, label_lr=0.0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "lambda_dssim", "backend", "tile_config", "opt_cfg",
        "label_lr",
    ),
)
def _static_step(
    model: GaussianModel,
    opt_state,
    batch: FrameBatch,
    frame_idx: jnp.ndarray,
    grad_masks: jnp.ndarray,
    it: jnp.ndarray,
    drop_max=0,
    mode: str = "std",
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
    tile_config=None,
    bg_color=None,
    opt_cfg=None,
    label_lr: float = 0.0,
):
    """One training iteration. mode in {"std", "entropy", "label"}.
    `bg_color`: optional traced [3] background (random_background support,
    reference OptimizationParams.random_background).
    `grad_masks` [F,1,H,W]: per-frame pixels whose gradients are zeroed
    (hand, or dilated hand|obj for the background stage) — indexed by the
    traced frame_idx IN-JIT.

    The LR tree is computed INSIDE the step from the traced iteration
    counter and the (static, hashable) OptimizationParams: building it on
    the host dispatched ~8 tiny eager device ops per iteration, which over
    the remote-TPU tunnel cost more than the whole compiled step (measured
    ~2.4 it/s vs ~34 it/s at 480p).

    `frame_idx` may be a scalar (reference semantics: one frame per update)
    or a [K] vector (StaticParams.frame_batch): the photometric gradient is
    then the MEAN over K frames rendered in one step via lax.scan —
    sequential per frame, so binning buffers stay single-frame sized —
    while densification statistics are accumulated per frame exactly as K
    separate reference iterations would (the 1/K mean scaling is undone on
    the probe gradients)."""
    fidxs = jnp.atleast_1d(jnp.asarray(frame_idx, jnp.int32))
    n_frames = fidxs.shape[0]
    lr_tree = _static_lr_tree(model, it, opt_cfg, mode, label_lr)
    bg = jnp.zeros(3, model.params.xyz.dtype) if bg_color is None else bg_color

    param_grads, probe_grads, losses, radii, dropped = _frames_loss_grads(
        model, batch, fidxs, grad_masks, mode, lambda_dssim, backend,
        tile_config, bg,
    )
    model = _apply_probe_stats(
        model, *_probe_stats(batch, probe_grads, radii, n_frames)
    )
    new_params, new_opt = adam_update(model.params, param_grads, opt_state, lr_tree)
    model = dataclasses.replace(model, params=new_params)
    out_radii = radii[0] if jnp.ndim(frame_idx) == 0 else radii
    return (
        model, new_opt, jnp.mean(losses), out_radii,
        jnp.maximum(drop_max, jnp.max(dropped)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "mode", "lambda_dssim", "backend", "tile_config", "opt_cfg",
        "label_lr", "axis",
    ),
)
def _dp_static_step(
    model: GaussianModel,
    opt_state,
    batch: FrameBatch,
    frame_idx: jnp.ndarray,  # [K] frame indices, K % mesh.shape[axis] == 0
    grad_masks: jnp.ndarray,
    it: jnp.ndarray,
    drop_max=0,
    mesh=None,
    mode: str = "std",
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
    tile_config=None,
    bg_color=None,
    opt_cfg=None,
    label_lr: float = 0.0,
    axis: str = "data",
):
    """Frame-data-parallel `_static_step`: the K-frame batch is sharded over
    the mesh's `axis`; each device runs the REAL per-frame loss body
    (`_frames_loss_grads` — same scan body as the single-device step) on its
    local shard, parameter gradients are `pmean`'d over ICI and the Adam
    update is applied replicated. Densification statistics reduce exactly as
    K sequential reference iterations: per-Gaussian grad-norm sums and
    visibility counts are `psum`'d, the max screen radius is `pmax`'d.

    This is the TPU replacement for training-loop throughput the reference
    obtains only by job-level parallelism (SURVEY §2.3): semantics equal the
    single-device frame_batch path (tests assert ~1e-5), wall-clock divides
    by the data-axis size."""
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    fidxs = jnp.asarray(frame_idx, jnp.int32)
    assert fidxs.shape[0] % n_dev == 0, (
        f"frame batch {fidxs.shape[0]} not divisible by {axis}={n_dev}"
    )
    lr_tree = _static_lr_tree(model, it, opt_cfg, mode, label_lr)
    bg = jnp.zeros(3, model.params.xyz.dtype) if bg_color is None else bg_color

    def body(model, opt_state, batch, fidxs_local, grad_masks, it, drop_max,
             bg, lr_tree):
        k_local = fidxs_local.shape[0]
        param_g, probe_g, losses, radii, dropped = _frames_loss_grads(
            model, batch, fidxs_local, grad_masks, mode, lambda_dssim,
            backend, tile_config, bg,
        )
        # mean over ALL K frames = pmean of per-device local means
        param_g = jax.lax.pmean(param_g, axis)
        loss = jax.lax.pmean(jnp.mean(losses), axis)
        gn, den, rmax = _probe_stats(batch, probe_g, radii, k_local)
        gn = jax.lax.psum(gn, axis)
        den = jax.lax.psum(den, axis)
        rmax = jax.lax.pmax(rmax, axis)
        m = _apply_probe_stats(model, gn, den, rmax)
        new_params, new_opt = adam_update(m.params, param_g, opt_state, lr_tree)
        m = dataclasses.replace(m, params=new_params)
        drop = jnp.maximum(
            drop_max, jax.lax.pmax(jnp.max(dropped), axis)
        )
        return m, new_opt, loss, radii, drop

    repl = P()
    shard = P(axis)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(repl, repl, repl, shard, repl, repl, repl, repl, repl),
        out_specs=(repl, repl, repl, shard, repl),
        check_vma=False,
    )
    return mapped(model, opt_state, batch, fidxs, grad_masks, it,
                  jnp.asarray(drop_max, jnp.int32), bg, lr_tree)


def _run_static_step(mesh, model, opt_state, batch, fidx, grad_masks, it,
                     drop_max, **kw):
    """Route one static/bg iteration to the single-device or the
    frame-data-parallel step. `fidx` may be a scalar or [K]."""
    if mesh is None or mesh.shape.get("data", 1) <= 1 or np.ndim(fidx) == 0:
        return _static_step(model, opt_state, batch, fidx, grad_masks, it,
                            drop_max, **kw)
    return _dp_static_step(model, opt_state, batch, fidx, grad_masks, it,
                           drop_max, mesh=mesh, **kw)


def _dp_frame_batch(fb: int, mesh) -> int:
    """Effective frame batch: a data mesh needs fb % n_data == 0; raise
    fb to the axis size when needed (one frame per device minimum)."""
    if mesh is None:
        return max(1, fb)
    n = mesh.shape.get("data", 1)
    fb = max(1, fb)
    if fb % n:
        fb = ((fb + n - 1) // n) * n
    return fb


def _log_dropped_pairs(stage: str, phase, drop_max) -> None:
    """End-of-phase report of the worst binning-capacity pair loss (SURVEY
    §7 hard-part 1: silent truncation biases training — make it loud)."""
    d = int(drop_max)
    tag = f"[{stage}] phase {phase}" if phase is not None else f"[{stage}]"
    if d:
        CONSOLE.log(
            f"{tag}: WARNING — up to {d} pairs/render dropped by binning "
            "capacities (raise TileConfig.max_pairs/max_per_tile or the "
            "auto_tile_config headroom)"
        )
    else:
        CONSOLE.log(f"{tag}: 0 pairs dropped by binning capacities")


_densify_jit = jax.jit(
    densify_and_prune,
    static_argnames=(
        "max_grad", "min_opacity", "extent", "max_screen_size", "percent_dense",
        "clone", "split", "curr_gen", "prune_prev_gen", "split_prev_gen",
        "which_object",
    ),
)
_reset_opacity_jit = jax.jit(reset_opacity, static_argnames=("max_opacity", "which_object"))
_prune_opacity_jit = jax.jit(prune_by_opacity, static_argnames=("min_opacity",))


@dataclasses.dataclass
class StaticPhaseResult:
    model: GaussianModel  # full model after the phase (is_object inferred)
    obj_model: GaussianModel  # object-only
    bg_model: GaussianModel  # background-only
    pred_masks: Dict[str, np.ndarray]  # image_name -> [H, W] binary label


def _split_by_is_object(model: GaussianModel):
    alive = model.aux.alive
    obj = dataclasses.replace(
        model,
        aux=dataclasses.replace(model.aux, alive=alive & (model.aux.is_object == 1)),
    )
    bg = dataclasses.replace(
        model,
        aux=dataclasses.replace(model.aux, alive=alive & (model.aux.is_object == 0)),
    )
    return compact(obj), compact(bg)


def _label_stack(stack, phase, n_phases, rewind, mask_valid):
    """Label-phase frame subset: the reference's rewind window
    (train_static.py:152-162, frames adjacent to the interaction)
    RESTRICTED to frames whose obj mask was actually shipped. BCE against
    a missing (all-zero) mask trains the label toward zero everywhere —
    the reference implicitly assumes the rewind window ships masks, but
    with all-phase training the next-static anchor's mask is exactly the
    one stage 1.1 is meant to COMPLETE, so it can be absent here."""
    if phase == 0:
        stack = stack[-rewind:]
    elif phase == n_phases - 1:
        stack = stack[:rewind]
    else:
        stack = stack[:rewind] + stack[-rewind:]
    valid = [i for i in stack if mask_valid[i]]
    if valid:
        return valid
    # rewind window shipped no masks: widen to any valid frame of the
    # phase; a phase with NO masks at all keeps the window (degenerate,
    # matches reference behavior)
    valid = [i for i in range(len(mask_valid)) if mask_valid[i]]
    return valid or stack


def train_static(
    cameras: Sequence,
    points: np.ndarray,
    colors: np.ndarray,
    cfg: Config,
    static_phase_frames: List[List[int]],
    cameras_extent: float,
    save_dir: Optional[str] = None,
    seed: int = 0,
    backend: str = "auto",
    first_phase_only: bool = False,
    checkpoint_every: int = 0,
    mesh=None,
) -> List[StaticPhaseResult]:
    """Stage 1.0. `static_phase_frames`: per-phase lists of camera indices
    (from data.readers.split_viewpoints_by_phase).

    `mesh`: optional jax.sharding.Mesh with a "data" axis — the frame batch
    is then sharded across devices per `_dp_static_step` (frame_batch is
    raised to a multiple of the axis size)."""
    rng = np.random.RandomState(seed)
    sp = cfg.static
    opt_cfg = cfg.opt
    total_iters = sp.std_train_iter + sp.entropy_reg_iter + sp.label_train_iter
    results: List[StaticPhaseResult] = []

    for phase, frame_idxs in enumerate(static_phase_frames):
        phase_cams = [cameras[i] for i in frame_idxs]
        batch = stack_cameras(phase_cams)
        model = from_points(
            points, colors, sh_degree=cfg.model.sh_degree,
            spatial_lr_scale=cameras_extent, seed=seed,
        )
        opt_state = adam_init(model.params)
        tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
        backend = pick_backend(tile_cfg, backend)
        key = jax.random.PRNGKey(seed + phase)

        # mid-stage checkpoint/resume (train/ckpt_hook.py)
        from egogaussian_tpu.train.ckpt_hook import StageCheckpointer
        from egogaussian_tpu.train.common import TrainState

        ckpt = StageCheckpointer(
            os.path.join(save_dir, f"ckpt_static_phase{phase}.npz")
            if save_dir and checkpoint_every else None,
            checkpoint_every,
        )
        start_it = 0
        if ckpt.exists():
            cap = ckpt.peek_capacity()
            while model.capacity < cap:
                model, opt_state, _ = ensure_capacity(
                    model, opt_state, min_free=model.capacity + 1
                )
            state, start_it, key = ckpt.try_restore(
                TrainState(model, opt_state, jnp.int32(0)), rng, key
            )
            model, opt_state = state.model, state.opt_state
            tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
            backend = pick_backend(tile_cfg, backend)

        # frame sub-stack: all frames during std+entropy; rewind subset in label
        stack = list(range(len(phase_cams)))
        mask_valid = np.asarray(batch.obj_mask_valid)
        # >= : a checkpoint taken exactly on the entropy-end boundary has
        # already applied the prune, so the label-phase rewind applies too
        if start_it >= sp.std_train_iter + sp.entropy_reg_iter and start_it > 0:
            stack = _label_stack(
                stack, phase, len(static_phase_frames), sp.rewind_frames,
                mask_valid,
            )
        CONSOLE.log(
            f"[static] phase {phase}: {len(phase_cams)} frames, "
            f"{total_iters} iters, capacity {model.capacity}"
        )
        drop_max = jnp.int32(0)  # worst binning-capacity loss seen (device)
        last_drop = 0
        fb = _dp_frame_batch(sp.frame_batch, mesh)
        for it in range(start_it + 1, total_iters + 1):
            if fb == 1:
                fidx = stack[rng.randint(len(stack))]
            else:
                fidx = np.array(
                    [stack[i] for i in rng.randint(len(stack), size=fb)],
                    np.int32,
                )
            if it <= sp.std_train_iter:
                mode = "std"
            elif it <= sp.std_train_iter + sp.entropy_reg_iter:
                mode = "entropy"
            else:
                mode = "label"

            bg_color = (
                rng.rand(3).astype(np.float32)
                if opt_cfg.random_background else None
            )
            model, opt_state, loss, radii, drop_max = _run_static_step(
                mesh, model, opt_state, batch, fidx, batch.hand_masks, it,
                drop_max,
                mode=mode, lambda_dssim=opt_cfg.lambda_dssim, backend=backend,
                tile_config=tile_cfg, bg_color=bg_color, opt_cfg=opt_cfg,
                label_lr=sp.label_lr,
            )

            # drop-triggered capacity regrowth at the interval host-sync
            if it % opt_cfg.densification_interval == 0:
                tile_cfg, last_drop, changed = maybe_regrow_tile_config(
                    model, batch.camera(0), tile_cfg, drop_max, last_drop,
                    "static",
                )
                if changed:  # new baseline: re-arm the running-max counter
                    drop_max, last_drop = jnp.int32(0), 0
                log_metrics(
                    "static", it, phase=phase, mode=mode, loss=loss,
                    alive=model.num_alive, capacity=model.capacity,
                    dropped_pairs=drop_max,
                )

            # densification schedule (train_static.py:125-133)
            if it <= sp.densify_until_iter:
                if it > sp.densify_from_iter and it % opt_cfg.densification_interval == 0:
                    size_threshold = 20.0 if it > opt_cfg.opacity_reset_interval else None
                    key, sub = jax.random.split(key)
                    res = _densify_jit(
                        model, opt_state, sub,
                        max_grad=opt_cfg.densify_grad_threshold,
                        min_opacity=0.005,
                        extent=cameras_extent,
                        max_screen_size=size_threshold,
                        percent_dense=opt_cfg.percent_dense,
                    )
                    model, opt_state = res.model, res.opt_state
                    if int(res.overflow):
                        CONSOLE.log(
                            f"[static] it {it}: densify overflow — "
                            f"{int(res.overflow)} candidates dropped "
                            "(capacity grows next interval)"
                        )
                    model, opt_state, grew = ensure_capacity(model, opt_state)
                    if grew:
                        # capacity growth recompiles anyway — re-estimate the
                        # binning capacities for the denser scene
                        tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
                if it % opt_cfg.opacity_reset_interval == 0:
                    model, opt_state = _reset_opacity_jit(model, opt_state)

            # entropy-phase end: prune + rewind (train_static.py:146-162)
            if it == sp.std_train_iter + sp.entropy_reg_iter:
                model, opt_state, n_pruned = _prune_opacity_jit(
                    model, opt_state, min_opacity=0.5
                )
                CONSOLE.log(
                    f"[static] pruned {int(n_pruned)} low-opacity; "
                    f"alive {int(model.num_alive)}"
                )
                stack = _label_stack(
                    stack, phase, len(static_phase_frames),
                    sp.rewind_frames, mask_valid,
                )

            # save at the END of the iteration so a checkpoint landing on a
            # phase boundary captures the boundary prune (the rewound frame
            # stack is recomputed from start_it on resume)
            ckpt.maybe_save(
                it, TrainState(model, opt_state, jnp.int32(it)), rng, key
            )

        _log_dropped_pairs("static", phase, drop_max)
        model = model.infer_is_object_from_label()
        obj_model, bg_model = _split_by_is_object(model)

        # predicted object masks from the thresholded label render
        pred_masks: Dict[str, np.ndarray] = {}
        for j, cam_obj in enumerate(phase_cams):
            lbl = render_label_image(model, batch.camera(j), backend=backend,
                                     tile_config=tile_cfg)
            pred_masks[cam_obj.image_name] = (np.asarray(lbl[0]) > 0.5).astype(
                np.float32
            )

        if save_dir:
            ply_dir = os.path.join(save_dir, "ply")
            save_ply(model, os.path.join(ply_dir, f"static_phase{phase}.ply"))
            save_ply(obj_model, os.path.join(ply_dir, f"static_phase{phase}_obj.ply"))
            save_ply(bg_model, os.path.join(ply_dir, f"static_phase{phase}_bg.ply"))
            mask_dir = os.path.join(save_dir, "obj_masks")
            os.makedirs(mask_dir, exist_ok=True)
            try:
                from PIL import Image

                for name, m in pred_masks.items():
                    Image.fromarray((m * 255).astype(np.uint8)).save(
                        os.path.join(mask_dir, f"{name}.png")
                    )
            except ImportError:
                pass

        results.append(
            StaticPhaseResult(
                model=model, obj_model=obj_model, bg_model=bg_model,
                pred_masks=pred_masks,
            )
        )
        if first_phase_only:
            break
    return results


def train_background(
    cameras: Sequence,
    points: np.ndarray,
    colors: np.ndarray,
    cfg: Config,
    train_frame_idxs: List[int],
    cameras_extent: float,
    save_dir: Optional[str] = None,
    seed: int = 0,
    backend: str = "auto",
    dilate_size: int = 5,
    checkpoint_every: int = 0,
    mesh=None,
) -> GaussianModel:
    """Stage 1.2: background 3DGS over all phases' frames with the
    interaction mask = dilate(hand | obj) gating gradients
    (train_static_bg.py:23-173)."""
    rng = np.random.RandomState(seed)
    bp = cfg.static_bg
    opt_cfg = cfg.opt
    total_iters = bp.std_train_iter + bp.entropy_reg_iter

    train_cams = [cameras[i] for i in train_frame_idxs]
    batch = stack_cameras(train_cams)
    # precompute dilated interaction masks on host (static per frame)
    int_masks = np.stack(
        [
            dilate_mask(
                np.maximum(np.asarray(c.hand_mask), np.asarray(c.obj_mask)),
                iterations=dilate_size,
            )
            for c in train_cams
        ]
    )
    # binary by construction — store uint8 (4x HBM saving; decoded in-jit)
    int_masks_j = jnp.asarray(int_masks.astype(np.uint8))

    model = from_points(
        points, colors, sh_degree=cfg.model.sh_degree,
        spatial_lr_scale=cameras_extent, seed=seed,
    )
    opt_state = adam_init(model.params)
    tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
    backend = pick_backend(tile_cfg, backend)
    key = jax.random.PRNGKey(seed)

    # mid-stage checkpoint/resume (same hook as train_static)
    from egogaussian_tpu.train.ckpt_hook import StageCheckpointer
    from egogaussian_tpu.train.common import TrainState

    ckpt = StageCheckpointer(
        os.path.join(save_dir, "ckpt_bg.npz")
        if save_dir and checkpoint_every else None,
        checkpoint_every,
    )
    start_it = 0
    if ckpt.exists():
        cap = ckpt.peek_capacity()
        while model.capacity < cap:
            model, opt_state, _ = ensure_capacity(
                model, opt_state, min_free=model.capacity + 1
            )
        state, start_it, key = ckpt.try_restore(
            TrainState(model, opt_state, jnp.int32(0)), rng, key
        )
        model, opt_state = state.model, state.opt_state
        tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
        backend = pick_backend(tile_cfg, backend)
    CONSOLE.log(f"[bg] {len(train_cams)} frames, {total_iters} iters")

    drop_max = jnp.int32(0)
    last_drop = 0
    fb = _dp_frame_batch(bp.frame_batch, mesh)
    for it in range(start_it + 1, total_iters + 1):
        if fb == 1:
            fidx = rng.randint(len(train_cams))
        else:
            fidx = rng.randint(len(train_cams), size=fb).astype(np.int32)
        mode = "std" if it <= bp.std_train_iter else "entropy"
        model, opt_state, loss, radii, drop_max = _run_static_step(
            mesh, model, opt_state, batch, fidx, int_masks_j, it,
            drop_max,
            mode=mode, lambda_dssim=opt_cfg.lambda_dssim, backend=backend,
            tile_config=tile_cfg, opt_cfg=opt_cfg,
        )
        if it % opt_cfg.densification_interval == 0:
            tile_cfg, last_drop, changed = maybe_regrow_tile_config(
                model, batch.camera(0), tile_cfg, drop_max, last_drop, "bg"
            )
            if changed:
                drop_max, last_drop = jnp.int32(0), 0
            log_metrics(
                "bg", it, mode=mode, loss=loss, alive=model.num_alive,
                capacity=model.capacity, dropped_pairs=drop_max,
            )
        if it <= bp.densify_until_iter:
            if it > bp.densify_from_iter and it % opt_cfg.densification_interval == 0:
                size_threshold = 20.0 if it > opt_cfg.opacity_reset_interval else None
                key, sub = jax.random.split(key)
                res = _densify_jit(
                    model, opt_state, sub,
                    max_grad=opt_cfg.densify_grad_threshold,
                    min_opacity=0.005,
                    extent=cameras_extent,
                    max_screen_size=size_threshold,
                    percent_dense=opt_cfg.percent_dense,
                )
                model, opt_state = res.model, res.opt_state
                if int(res.overflow):
                    CONSOLE.log(
                        f"[bg] it {it}: densify overflow — "
                        f"{int(res.overflow)} candidates dropped"
                    )
                model, opt_state, grew = ensure_capacity(model, opt_state)
                if grew:
                    tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
            if it % opt_cfg.opacity_reset_interval == 0:
                model, opt_state = _reset_opacity_jit(model, opt_state)
        if it == total_iters:
            model, opt_state, n_pruned = _prune_opacity_jit(
                model, opt_state, min_opacity=0.5
            )
            CONSOLE.log(f"[bg] final prune: {int(n_pruned)} removed")
        ckpt.maybe_save(
            it, TrainState(model, opt_state, jnp.int32(it)), rng, key
        )

    _log_dropped_pairs("bg", None, drop_max)
    if save_dir:
        save_ply(model, os.path.join(save_dir, "static_bg.ply"))
    return model
