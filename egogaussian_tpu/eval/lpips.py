"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 backbone, in JAX.

The reference imports the external `lpipsPyTorch` package
(trainers/eval_metric.py:12) which is not even in its repo (SURVEY.md §2
row 17); this module is the framework's own implementation:

  * VGG16 feature trunk (conv slices 1-5, pre-ReLU boundaries after
    relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3),
  * input scaling by the LPIPS shift/scale constants,
  * unit-normalized channel features, 1x1 linear heads, spatial mean, sum.

Weights are DATA, not code: this image has no network egress and no cached
torchvision/LPIPS checkpoints, so calibrated weights must be supplied as an
.npz. One-flag recipe for a user who has the standard upstream files:

  1. torchvision VGG16: `vgg16-397923af.pth`
     (https://download.pytorch.org/models/ — the 397923af in the filename
     IS the torchvision SHA256 prefix; torch.hub verifies it on download)
  2. LPIPS v0.1 VGG linear heads: `lpips/weights/v0.1/vgg.pth` from
     richzhang/PerceptualSimilarity (keys lin0..lin4 -> model.1.weight)
  3. `convert_torch_lpips(torch.load(vgg)["features.*"], torch.load(lpips),
     "lpips_vgg.npz")` — round-trip-tested against the torch reference in
     tests/test_eval.py (test_lpips_converter_roundtrip)
  4. `cli/train ... --lpips_weights lpips_vgg.npz` (or pass
     `lpips_fn=LPIPS(load_lpips_weights(path))` to run_pipeline) — the
     LPIPS row then appears in evaluation/results.txt; without weights the
     row reads "unavailable" instead of being silently omitted.

Without weights the class can run with He-initialized features
(`allow_random=True`) — useful for pipeline plumbing tests, clearly NOT a
calibrated perceptual metric — or raise, which is the default.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 configuration: (out_channels, num_convs) per block
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# LPIPS input normalization (the standard shift/scale over [-1, 1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv, NCHW x OIHW."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


@dataclasses.dataclass
class LPIPSWeights:
    convs: List[jnp.ndarray]  # 13 conv kernels OIHW
    biases: List[jnp.ndarray]
    lins: List[jnp.ndarray]  # 5 linear heads [C] (non-negative)


def random_lpips_weights(seed: int = 0) -> LPIPSWeights:
    """He-initialized stand-in weights (uncalibrated; plumbing tests only)."""
    rng = np.random.RandomState(seed)
    convs, biases = [], []
    in_c = 3
    for out_c, n in _VGG_BLOCKS:
        for _ in range(n):
            std = np.sqrt(2.0 / (in_c * 9))
            convs.append(jnp.asarray(rng.randn(out_c, in_c, 3, 3).astype(np.float32) * std))
            biases.append(jnp.zeros(out_c, jnp.float32))
            in_c = out_c
    lins = [jnp.ones(c, jnp.float32) / c for c, _ in _VGG_BLOCKS]
    return LPIPSWeights(convs=convs, biases=biases, lins=lins)


def load_lpips_weights(path: str) -> LPIPSWeights:
    """Load from .npz with keys conv{i}_w, conv{i}_b (i in 0..12, OIHW) and
    lin{j} (j in 0..4, per-channel non-negative weights)."""
    data = np.load(path)
    convs = [jnp.asarray(data[f"conv{i}_w"]) for i in range(13)]
    biases = [jnp.asarray(data[f"conv{i}_b"]) for i in range(13)]
    lins = [jnp.asarray(data[f"lin{j}"]) for j in range(5)]
    return LPIPSWeights(convs=convs, biases=biases, lins=lins)


def convert_torch_lpips(vgg_state: Dict, lpips_state: Dict, out_path: str) -> None:
    """Convert torchvision VGG16 `features` state-dict + LPIPS linear-layer
    state-dict into the .npz this module loads. Host-side, torch optional —
    accepts any mapping of name -> array-like."""
    out = {}
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, li in enumerate(conv_idx):
        out[f"conv{i}_w"] = np.asarray(vgg_state[f"features.{li}.weight"])
        out[f"conv{i}_b"] = np.asarray(vgg_state[f"features.{li}.bias"])
    for j in range(5):
        w = np.asarray(lpips_state[f"lin{j}.model.1.weight"])
        out[f"lin{j}"] = w.reshape(-1)
    np.savez(out_path, **out)


class LPIPS:
    """d(x, y) perceptual distance. Images [3, H, W] or [N, 3, H, W] in [0, 1]."""

    def __init__(
        self,
        weights: Optional[LPIPSWeights] = None,
        weights_path: Optional[str] = None,
        allow_random: bool = False,
    ):
        if weights is None and weights_path is not None:
            weights = load_lpips_weights(weights_path)
        if weights is None:
            if not allow_random:
                raise ValueError(
                    "LPIPS needs calibrated weights (.npz via load_lpips_weights /"
                    " convert_torch_lpips). Pass allow_random=True for an"
                    " uncalibrated stand-in (tests only)."
                )
            weights = random_lpips_weights()
        self.weights = weights
        self._fn = jax.jit(self._distance)

    def _features(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # to [-1, 1], then LPIPS scaling
        x = 2.0 * x - 1.0
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(_SCALE)[
            None, :, None, None
        ]
        feats = []
        k = 0
        for b, (out_c, n) in enumerate(_VGG_BLOCKS):
            for _ in range(n):
                x = jax.nn.relu(_conv(x, self.weights.convs[k], self.weights.biases[k]))
                k += 1
            feats.append(x)
            if b < len(_VGG_BLOCKS) - 1:
                x = _maxpool(x)
        return feats

    def _distance(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[None]
        if y.ndim == 3:
            y = y[None]
        fx = self._features(x)
        fy = self._features(y)
        total = 0.0
        for f1, f2, lin in zip(fx, fy, self.weights.lins):
            n1 = f1 / jnp.sqrt(jnp.sum(f1**2, axis=1, keepdims=True) + 1e-10)
            n2 = f2 / jnp.sqrt(jnp.sum(f2**2, axis=1, keepdims=True) + 1e-10)
            diff = (n1 - n2) ** 2
            weighted = jnp.einsum("nchw,c->nhw", diff, lin)
            total = total + jnp.mean(weighted, axis=(1, 2))
        return total

    def __call__(self, x, y):
        return self._fn(jnp.asarray(x), jnp.asarray(y))
