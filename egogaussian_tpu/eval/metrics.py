"""Hand-masked evaluation metrics.

Protocol twin of reference `trainers/eval_metric.py:129-175` (BASELINE.md):
metrics are computed on `render * (1 - hand_mask)` vs `gt * (1 - hand_mask)`
— PSNR from utils/image_utils.py:9-11, SSIM from utils/loss_utils.py:66-106,
LPIPS-VGG (eval/lpips.py).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.ops.losses import psnr, ssim


@jax.jit
def masked_psnr(render: jnp.ndarray, gt: jnp.ndarray, hand: jnp.ndarray):
    m = 1.0 - hand
    return psnr(render * m, gt * m)


@jax.jit
def masked_ssim(render: jnp.ndarray, gt: jnp.ndarray, hand: jnp.ndarray):
    m = 1.0 - hand
    return ssim(render * m, gt * m)


def evaluate_metrics(
    renders: Sequence[np.ndarray],
    gts: Sequence[np.ndarray],
    hands: Sequence[np.ndarray],
    lpips_fn=None,
) -> Dict[str, float]:
    """Mean PSNR/SSIM (and LPIPS if a callable is given) over a split."""
    psnrs, ssims, lpipss = [], [], []
    for r, g, h in zip(renders, gts, hands):
        r_j, g_j, h_j = jnp.asarray(r), jnp.asarray(g), jnp.asarray(h)
        psnrs.append(float(masked_psnr(r_j, g_j, h_j)))
        ssims.append(float(masked_ssim(r_j, g_j, h_j)))
        if lpips_fn is not None:
            m = 1.0 - h_j
            lpipss.append(float(np.asarray(lpips_fn(r_j * m, g_j * m)).mean()))
    out = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
    }
    if lpips_fn is not None:
        out["lpips"] = float(np.mean(lpipss)) if lpipss else float("nan")
    return out
