"""GaussianModel as a functional pytree.

TPU-native redesign of reference `scene/gaussian_model.py` (the 1.1k-LoC
central class). Instead of mutable nn.Parameters whose length changes on
every densify/prune (which would force an XLA recompile each time), the model
is a **fixed-capacity** struct-of-arrays with an `alive` mask: densify/clone/
prune become masked scatters at static shape (SURVEY.md §7 hard-part 2).
Capacity grows by power-of-2 buckets on the host (rare recompiles).

Activations match the reference (gaussian_model.py:28-44): scaling=exp,
opacity=sigmoid, rotation=normalized quaternion. The PLY schema is
byte-compatible with the reference (x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,
scale_*,rot_*,label,generation,is_object — gaussian_model.py:340-480) so
checkpoints interoperate with the reference tooling and viewers.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.ops.covariance import (
    covariance_from_scaling_rotation,
    covariance_from_scaling_rotation_rotated,
)
from egogaussian_tpu.ops.knn import mean_sq_dist_to_knn
from egogaussian_tpu.ops.sh import rgb_to_sh


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x)) if isinstance(x, (float, np.ndarray)) else jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Trainable leaves, all length == capacity."""

    xyz: jnp.ndarray  # [C, 3]
    features_dc: jnp.ndarray  # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    log_scales: jnp.ndarray  # [C, 3]
    quats: jnp.ndarray  # [C, 4] wxyz (normalized on use)
    opacity_logit: jnp.ndarray  # [C, 1]
    label: jnp.ndarray  # [C, 1] trainable object-identity (raw float)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianAux:
    """Non-trainable per-Gaussian state, all length == capacity."""

    alive: jnp.ndarray  # [C] bool
    generation: jnp.ndarray  # [C] int32 densification birth cohort
    is_object: jnp.ndarray  # [C] int32 0/1 static segmentation
    max_radii2d: jnp.ndarray  # [C] float32
    xyz_gradient_accum: jnp.ndarray  # [C] float32
    denom: jnp.ndarray  # [C] float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianModel:
    params: GaussianParams
    aux: GaussianAux
    sh_degree: int = dataclasses.field(metadata=dict(static=True), default=0)
    spatial_lr_scale: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    # ---- activated views (reference gaussian_model.py:28-44) ----
    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def scaling(self) -> jnp.ndarray:
        return jnp.exp(self.params.log_scales)

    @property
    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity_logit[:, 0])

    @property
    def features(self) -> jnp.ndarray:
        """[C, K, 3] SH coefficients (DC + rest)."""
        return jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1
        )

    def covariance(self, scale_modifier: float = 1.0) -> jnp.ndarray:
        return covariance_from_scaling_rotation(
            self.scaling, self.params.quats, scale_modifier
        )

    def covariance_rotated(
        self, extra_rot: jnp.ndarray, which_object: int = 1, scale_modifier: float = 1.0
    ) -> jnp.ndarray:
        """Rotated covariance for object Gaussians during pose optimization
        (reference gaussian_model.py:46-63)."""
        mask = self.aux.is_object == which_object
        return covariance_from_scaling_rotation_rotated(
            self.scaling, self.params.quats, extra_rot, mask, scale_modifier
        )

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.aux.alive.astype(jnp.int32))

    def infer_is_object_from_label(self, threshold: float = 0.5) -> "GaussianModel":
        """Threshold trainable label into the hard is_object segmentation
        (reference gaussian_model.py:1116-1121)."""
        is_obj = (self.params.label[:, 0] > threshold).astype(jnp.int32)
        return dataclasses.replace(
            self, aux=dataclasses.replace(self.aux, is_object=is_obj)
        )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _empty_params(capacity: int, sh_degree: int) -> GaussianParams:
    k_rest = (sh_degree + 1) ** 2 - 1
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, k_rest, 3), jnp.float32),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (capacity, 1)),
        opacity_logit=jnp.full((capacity, 1), -10.0, jnp.float32),
        label=jnp.full((capacity, 1), 0.01, jnp.float32),
    )


def _empty_aux(capacity: int) -> GaussianAux:
    return GaussianAux(
        alive=jnp.zeros((capacity,), bool),
        generation=jnp.zeros((capacity,), jnp.int32),
        is_object=jnp.zeros((capacity,), jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


def from_points(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int = 0,
    spatial_lr_scale: float = 1.0,
    capacity: Optional[int] = None,
    rand_pts_init: Optional[int] = None,
    rand_label_init: bool = False,
    seed: int = 0,
) -> GaussianModel:
    """Initialize from a point cloud (reference create_from_pcd,
    gaussian_model.py:274-338): kNN-seeded isotropic log-scales, identity
    quats, opacity sigmoid^-1(0.1), label 0.01 (or uniform random)."""
    rng = np.random.RandomState(seed)
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    if rand_pts_init is not None:
        # random-point init override (gaussian_model.py:292-299)
        points = rng.uniform(points.min(), points.max(), (rand_pts_init, 3)).astype(
            np.float32
        )
        colors = rng.uniform(colors.min(), colors.max(), (rand_pts_init, 3)).astype(
            np.float32
        )
    n = points.shape[0]
    if capacity is None:
        capacity = _next_pow2(max(2 * n, 1024))
    assert capacity >= n

    dist2 = np.maximum(np.asarray(mean_sq_dist_to_knn(jnp.asarray(points), k=3)), 1e-7)
    log_scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    params = _empty_params(capacity, sh_degree)
    aux = _empty_aux(capacity)

    label0 = (
        rng.rand(n, 1).astype(np.float32)
        if rand_label_init
        else np.full((n, 1), 0.01, np.float32)
    )
    params = dataclasses.replace(
        params,
        xyz=params.xyz.at[:n].set(points),
        features_dc=params.features_dc.at[:n].set(
            np.asarray(rgb_to_sh(jnp.asarray(colors)))[:, None, :]
        ),
        log_scales=params.log_scales.at[:n].set(log_scales),
        opacity_logit=params.opacity_logit.at[:n].set(
            float(inverse_sigmoid(0.1))
        ),
        label=params.label.at[:n].set(label0),
    )
    aux = dataclasses.replace(aux, alive=aux.alive.at[:n].set(True))
    return GaussianModel(
        params=params, aux=aux, sh_degree=sh_degree, spatial_lr_scale=spatial_lr_scale
    )


def compact(model: GaussianModel, capacity: Optional[int] = None) -> GaussianModel:
    """Host-side: pack alive Gaussians to the front and resize capacity.
    Used between stages and before saving. NOT jittable (dynamic count)."""
    alive = np.asarray(model.aux.alive)
    idx = np.nonzero(alive)[0]
    n = len(idx)
    if capacity is None:
        capacity = _next_pow2(max(2 * n, 1024))
    p_np = {f.name: np.asarray(getattr(model.params, f.name))[idx]
            for f in dataclasses.fields(model.params)}
    a_np = {f.name: np.asarray(getattr(model.aux, f.name))[idx]
            for f in dataclasses.fields(model.aux)}
    params = _empty_params(capacity, model.sh_degree)
    aux = _empty_aux(capacity)
    params = dataclasses.replace(
        params, **{k: getattr(params, k).at[:n].set(v) for k, v in p_np.items()}
    )
    aux = dataclasses.replace(
        aux, **{k: getattr(aux, k).at[:n].set(v) for k, v in a_np.items()}
    )
    return dataclasses.replace(model, params=params, aux=aux)


def ensure_capacity(model, opt_state, min_free: int = None):
    """Host-side capacity growth: if fewer than `min_free` dead slots remain,
    double the capacity (power-of-2 buckets => rare recompiles; SURVEY.md §7
    hard-part 2). Pads params, aux and Adam moments with zeros; returns
    (model, opt_state, grew: bool)."""
    import jax.tree_util as jtu

    n = int(np.asarray(model.num_alive))
    C = model.capacity
    if min_free is None:
        min_free = max(C // 8, 256)
    if C - n >= min_free:
        return model, opt_state, False
    new_c = C * 2

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((C,) + x.shape[1:], x.dtype)], axis=0
        )

    # Pad params with SAFE per-field defaults, not zeros: a zero quaternion
    # has a NaN normalize-gradient, and even though dead rows get zero loss
    # gradient, 0 * NaN = NaN poisons the whole array on the next step.
    fresh = _empty_params(new_c, model.sh_degree)
    params = GaussianParams(
        **{
            f.name: jnp.concatenate(
                [getattr(model.params, f.name), getattr(fresh, f.name)[C:]],
                axis=0,
            )
            for f in dataclasses.fields(model.params)
        }
    )
    # aux needs type-correct padding (alive False, quats not needed here)
    aux = GaussianAux(
        alive=jnp.concatenate([model.aux.alive, jnp.zeros((C,), bool)]),
        generation=pad(model.aux.generation),
        is_object=pad(model.aux.is_object),
        max_radii2d=pad(model.aux.max_radii2d),
        xyz_gradient_accum=pad(model.aux.xyz_gradient_accum),
        denom=pad(model.aux.denom),
    )
    new_model = dataclasses.replace(model, params=params, aux=aux)
    new_opt = dataclasses.replace(
        opt_state,
        mu=jtu.tree_map(pad, opt_state.mu),
        nu=jtu.tree_map(pad, opt_state.nu),
    )
    assert new_model.capacity == new_c
    return new_model, new_opt, True


def combine_models(a: GaussianModel, b: GaussianModel) -> GaussianModel:
    """Concatenate two models (reference combine_gaussians,
    gaussian_model.py:1072-1089) — host-side, used by fine_all to merge the
    fine-tuned object with the background."""
    a = compact(a)
    b = compact(b)
    na = int(np.asarray(a.num_alive))
    nb = int(np.asarray(b.num_alive))
    capacity = _next_pow2(max(2 * (na + nb), 1024))
    params = _empty_params(capacity, a.sh_degree)
    aux = _empty_aux(capacity)
    for f in dataclasses.fields(params):
        va = np.asarray(getattr(a.params, f.name))[:na]
        vb = np.asarray(getattr(b.params, f.name))[:nb]
        arr = getattr(params, f.name).at[: na + nb].set(
            np.concatenate([va, vb], axis=0)
        )
        params = dataclasses.replace(params, **{f.name: arr})
    for f in dataclasses.fields(aux):
        va = np.asarray(getattr(a.aux, f.name))[:na]
        vb = np.asarray(getattr(b.aux, f.name))[:nb]
        arr = getattr(aux, f.name).at[: na + nb].set(np.concatenate([va, vb], axis=0))
        aux = dataclasses.replace(aux, **{f.name: arr})
    return dataclasses.replace(a, params=params, aux=aux)


_POINT_COLORS = {
    "red": (1.0, 0.05, 0.05),
    "blue": (0.05, 0.05, 1.0),
    "green": (0.05, 0.8, 0.1),
}


def make_it_a_point(
    model: GaussianModel, color: str = "red", scale: float = 0.02
) -> GaussianModel:
    """Collapse the model to a single opaque colored blob at its centroid —
    used by trajectory visualization (reference make_it_a_point,
    gaussian_model.py:1091-1114)."""
    from egogaussian_tpu.ops.sh import rgb_to_sh

    alive = model.aux.alive
    w = alive.astype(jnp.float32)[:, None]
    centroid = jnp.sum(model.params.xyz * w, axis=0) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    capacity = 128
    params = _empty_params(capacity, model.sh_degree)
    aux = _empty_aux(capacity)
    rgb = jnp.asarray(_POINT_COLORS.get(color, _POINT_COLORS["red"]))
    params = dataclasses.replace(
        params,
        xyz=params.xyz.at[0].set(centroid),
        features_dc=params.features_dc.at[0, 0].set(rgb_to_sh(rgb)),
        log_scales=params.log_scales.at[0].set(jnp.log(scale)),
        opacity_logit=params.opacity_logit.at[0].set(8.0),  # ~1.0
    )
    aux = dataclasses.replace(
        aux,
        alive=aux.alive.at[0].set(True),
        is_object=aux.is_object.at[0].set(1),
    )
    return dataclasses.replace(model, params=params, aux=aux)


# ---------------------------------------------------------------------------
# PLY IO — byte-compatible with the reference schema
# ---------------------------------------------------------------------------

def save_ply(model: GaussianModel, path: str) -> None:
    """Write alive Gaussians in the reference's extended-3DGS PLY schema
    (gaussian_model.py:375-397)."""
    from egogaussian_tpu.utils.ply import write_ply

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    alive = np.asarray(model.aux.alive)
    idx = np.nonzero(alive)[0]
    xyz = np.asarray(model.params.xyz)[idx]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    # reference stores f_dc/f_rest as [N, K, 3] transposed to channel-major
    k_dc = model.params.features_dc.shape[1]
    k_rest = model.params.features_rest.shape[1]
    f_dc = (
        np.asarray(model.params.features_dc)[idx].transpose(0, 2, 1).reshape(n, 3 * k_dc)
    )
    f_rest = (
        np.asarray(model.params.features_rest)[idx]
        .transpose(0, 2, 1)
        .reshape(n, 3 * k_rest)
    )
    opacity = np.asarray(model.params.opacity_logit)[idx]
    scales = np.asarray(model.params.log_scales)[idx]
    rots = np.asarray(model.params.quats)[idx]
    labels = np.asarray(model.params.label)[idx]
    gens = np.asarray(model.aux.generation)[idx].astype(np.float32)[:, None]
    is_obj = np.asarray(model.aux.is_object)[idx].astype(np.float32)[:, None]

    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(f_dc.shape[1])]
    names += [f"f_rest_{i}" for i in range(f_rest.shape[1])]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(scales.shape[1])]
    names += [f"rot_{i}" for i in range(rots.shape[1])]
    names += ["label", "generation", "is_object"]

    attributes = np.concatenate(
        [xyz, normals, f_dc, f_rest, opacity, scales, rots, labels, gens, is_obj],
        axis=1,
    )
    write_ply(path, names, attributes)


def load_ply(
    path: str,
    sh_degree: int = 0,
    is_object: bool = False,
    force_bg: bool = False,
    capacity: Optional[int] = None,
    spatial_lr_scale: float = 1.0,
) -> GaussianModel:
    """Load a (reference-compatible) PLY into a fresh model
    (gaussian_model.py:399-480 semantics incl. missing-field defaults)."""
    from egogaussian_tpu.utils.ply import read_ply

    v, _ = read_ply(path)
    names = tuple(v.keys())
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    n = xyz.shape[0]
    opacity = np.asarray(v["opacity"], np.float32)[:, None]
    f_dc = np.stack([v["f_dc_0"], v["f_dc_1"], v["f_dc_2"]], axis=1).astype(np.float32)
    rest_names = sorted(
        (x for x in names if x.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    k_rest = (sh_degree + 1) ** 2 - 1
    assert len(rest_names) == 3 * k_rest, (len(rest_names), k_rest)
    if rest_names:
        f_rest = np.stack([v[x] for x in rest_names], axis=1).astype(np.float32)
        f_rest = f_rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    scale_names = sorted(
        (x for x in names if x.startswith("scale_")), key=lambda s: int(s.split("_")[-1])
    )
    scales = np.stack([v[x] for x in scale_names], axis=1).astype(np.float32)
    rot_names = sorted(
        (x for x in names if x.startswith("rot_")), key=lambda s: int(s.split("_")[-1])
    )
    rots = np.stack([v[x] for x in rot_names], axis=1).astype(np.float32)
    labels = (
        np.asarray(v["label"], np.float32)[:, None]
        if "label" in names
        else np.full((n, 1), 0.01, np.float32)
    )
    gens = (
        np.asarray(v["generation"]).astype(np.int32)
        if "generation" in names
        else np.zeros(n, np.int32)
    )
    if "is_object" in names:
        is_obj = np.asarray(v["is_object"]).astype(np.int32)
    else:
        is_obj = np.full(n, 1 if is_object else 0, np.int32)
    if force_bg:
        is_obj = np.zeros(n, np.int32)

    if capacity is None:
        capacity = _next_pow2(max(2 * n, 1024))
    params = _empty_params(capacity, sh_degree)
    aux = _empty_aux(capacity)
    params = dataclasses.replace(
        params,
        xyz=params.xyz.at[:n].set(xyz),
        features_dc=params.features_dc.at[:n].set(f_dc[:, None, :]),
        features_rest=params.features_rest.at[:n].set(f_rest),
        log_scales=params.log_scales.at[:n].set(scales),
        quats=params.quats.at[:n].set(rots),
        opacity_logit=params.opacity_logit.at[:n].set(opacity),
        label=params.label.at[:n].set(labels),
    )
    aux = dataclasses.replace(
        aux,
        alive=aux.alive.at[:n].set(True),
        generation=aux.generation.at[:n].set(gens),
        is_object=aux.is_object.at[:n].set(is_obj),
    )
    return GaussianModel(
        params=params, aux=aux, sh_degree=sh_degree, spatial_lr_scale=spatial_lr_scale
    )
