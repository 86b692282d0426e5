"""Pre-generate validation COLMAP datasets with JIT-compiled gt rendering.

make_synthetic_video renders each frame EAGERLY; on the axon tunnel an
unjitted dispatch is ~seconds per op, so a 126-frame 480p video takes hours
(observed: 16 min with zero frames done). This script monkeypatches the
module's render entry points with jit wrappers IN-PROCESS (no source edit —
the full pytest suite may be running concurrently from the same tree) and
writes the dataset dirs the validation queue jobs then resume past.

The proper in-library jit belongs in synthetic.py; land it when no suite
is in flight (resume/reproducibility tests re-import source mid-run).

Usage: python scripts/pregen_dataset.py OUTDIR FRAMES_STATIC [FRAMES_DYNAMIC]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import egogaussian_tpu.data.synthetic as syn


def main():
    out = sys.argv[1]
    frames_static = int(sys.argv[2])
    frames_dynamic = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    ds = os.path.join(out, "dataset")
    if os.path.exists(os.path.join(ds, "sparse", "0", "points3D.bin")):
        print(f"{ds} already exists — nothing to do", flush=True)
        return

    print("backend:", jax.default_backend(), flush=True)
    # jit the hot render path; intrinsics/size args are hashable python
    # scalars -> static, so each distinct gaussian-count traces once.
    syn.project_gaussians = jax.jit(
        syn.project_gaussians, static_argnums=(7, 8))
    syn.composite_oracle = jax.jit(
        syn.composite_oracle, static_argnums=(4, 5))
    syn.se3_apply = jax.jit(syn.se3_apply)

    import egogaussian_tpu.data.export_colmap as exc
    exc.rotmat_to_quat = jax.jit(exc.rotmat_to_quat)

    vid = syn.make_synthetic_video(
        width=640, height=480, n_bg=4000, n_obj=400,
        frames_static=frames_static, frames_dynamic=frames_dynamic, seed=7,
    )
    print(f"video generated: {len(vid.cameras)} frames", flush=True)

    from egogaussian_tpu.data.export_colmap import export_colmap_dataset
    export_colmap_dataset(vid, ds)
    print(f"dataset exported to {ds}", flush=True)


if __name__ == "__main__":
    main()
