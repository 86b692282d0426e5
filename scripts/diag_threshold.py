"""Confirm the root cause of the pallas-vs-oracle TPU grad residue.

Hypothesis (round 3, from diag_divergence results): the residue is
ALPHA_EPS *threshold-flip noise* — every compositor zeroes
alpha = op*exp(-Q/2) < 1/255, but the Mosaic kernel, the XLA tiled
compositor and the XLA oracle each compute alpha through differently
rounded expression orders, so pixels whose alpha sits within ~1 ulp of the
threshold flip between "zeroed" and "contributing" across backends. A
flipped pixel moves the image by <= EPS*T*color (~4e-3) and kicks a
discontinuous gradient term — exactly the observed error scale, while the
dense per-tile reference (same expression structure as the kernel) matches
the kernel at ~1e-5.

Experiments:
  E1: is bwd_exact_total live on TPU? bit-diff its grads vs the default
      backward on the same scene (diag_divergence found them equal to 4
      significant digits on every field — either dead plumbing or a shared
      threshold-dominated max).
  E2: threshold-sensitivity envelope: oracle grads with EPS*(1-d) vs
      EPS*(1+d) for d=1e-4. If that self-envelope is the same order as the
      pallas-vs-oracle error, the residue is threshold sensitivity, not
      kernel math.
  E3: per-offender forensics: for the worst pallas-vs-oracle xyz-grad
      gaussians, the min over pixels of |alpha - EPS|/EPS in the oracle
      (a near-zero min = the gaussian owns a threshold-straddling pixel).

Usage: python scripts/diag_threshold.py [--width 160 --height 120]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--out", default="/root/repo/val_runs/diag_r3")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from scripts.diag_divergence import (
        GRAD_FIELDS, log, loss_and_grad_fns, make_problem,
    )
    from egogaussian_tpu.train.common import auto_tile_config

    model, batch = make_problem(a.width, a.height)
    tile_cfg = auto_tile_config(model, batch.camera(0))
    fns = loss_and_grad_fns(model, batch, tile_cfg)

    log(a.out, {"exp": "env2", "backend": jax.default_backend()})

    # ---- E1: bwd_exact_total liveness ----
    g_def = fns["pallas"](model.params, model)
    g_exa = fns["pallas_exact_total"](model.params, model)
    bitdiff = {}
    for name in GRAD_FIELDS:
        x = np.asarray(getattr(g_def, name))
        y = np.asarray(getattr(g_exa, name))
        n_diff = int((x.view(np.int32) != y.view(np.int32)).sum())
        bitdiff[name] = {
            "n_bits_differ": n_diff,
            "max_abs_diff": float(np.max(np.abs(x - y))),
        }
    log(a.out, {"exp": "E1_exact_total_liveness", "bitdiff": bitdiff})

    # ---- E2: oracle threshold-sensitivity envelope ----
    from egogaussian_tpu.render import oracle as oracle_mod
    from egogaussian_tpu.train.common import (
        image_loss, mask_grad, render_gaussians,
    )

    def oracle_grad_with_eps(eps):
        # the oracle reads ALPHA_EPS at trace time (module constant); trace
        # a fresh jit with the patched value
        old = oracle_mod.ALPHA_EPS
        oracle_mod.ALPHA_EPS = eps
        try:
            def loss(params, m0):
                m = dataclasses.replace(m0, params=params)
                cam, gt, hand, _ = batch.frame(0)
                res = render_gaussians(m, cam, jnp.zeros(3), backend="oracle")
                return image_loss(mask_grad(res.image, hand), gt, 0.2)

            return jax.jit(jax.grad(loss))(model.params, model)
        finally:
            oracle_mod.ALPHA_EPS = old

    eps0 = float(oracle_mod.ALPHA_EPS)
    g_o = fns["oracle"](model.params, model)
    rec = {"exp": "E2_threshold_envelope"}
    for d in (1e-5, 1e-4, 1e-3):
        g_lo = oracle_grad_with_eps(eps0 * (1 - d))
        g_hi = oracle_grad_with_eps(eps0 * (1 + d))
        env = {}
        for name in GRAD_FIELDS:
            lo = getattr(g_lo, name)
            hi = getattr(g_hi, name)
            ref = getattr(g_o, name)
            scale = float(jnp.max(jnp.abs(ref))) or 1.0
            env[name] = float(jnp.max(jnp.abs(lo - hi))) / scale
        rec[f"envelope_rel_d{d:g}"] = {
            k: float(f"{v:.4g}") for k, v in env.items()
        }
    # pallas-vs-oracle for comparison
    pall = {}
    for name in GRAD_FIELDS:
        ref = getattr(g_o, name)
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        pall[name] = float(
            jnp.max(jnp.abs(ref - getattr(g_def, name)))
        ) / scale
    rec["pallas_vs_oracle_rel"] = {k: float(f"{v:.4g}") for k, v in pall.items()}
    log(a.out, rec)

    # ---- E3: offender forensics ----
    from egogaussian_tpu.render.project import project_gaussians

    diff = np.asarray(
        jnp.max(jnp.abs(g_o.xyz - g_def.xyz), axis=-1)
    )
    scale = float(np.max(np.abs(np.asarray(g_o.xyz)))) or 1.0
    order = np.argsort(-diff)[:8]
    cam = batch.camera(0)
    proj = project_gaussians(
        model.params.xyz, model.covariance(), cam.viewmat,
        cam.fx, cam.fy, cam.cx, cam.cy, a.width, a.height,
        valid_mask=model.aux.alive,
    )
    mu = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)
    op = np.asarray(jnp.where(model.aux.alive, model.opacity, 0.0)).reshape(-1)
    ys, xs = np.mgrid[0:a.height, 0:a.width]
    rows = []
    for g in order:
        dx = xs + 0.5 - mu[g, 0]
        dy = ys + 0.5 - mu[g, 1]
        q = con[g, 0] * dx * dx + 2 * con[g, 1] * dx * dy + con[g, 2] * dy * dy
        alpha = op[g] * np.exp(-0.5 * np.maximum(q, 0.0))
        eps_dist = np.min(np.abs(alpha - eps0)) / eps0
        rows.append({
            "gaussian": int(g),
            "grad_rel": float(f"{diff[g] / scale:.4g}"),
            "min_alpha_eps_dist_rel": float(f"{eps_dist:.4g}"),
            "n_pixels_within_1e-3_of_eps": int(
                (np.abs(alpha - eps0) / eps0 < 1e-3).sum()
            ),
        })
    log(a.out, {"exp": "E3_offender_forensics", "scale_field": "xyz",
                "offenders": rows})


if __name__ == "__main__":
    main()
