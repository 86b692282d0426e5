"""On-TPU A/B: tile_size 16 vs 32 on the bench headline step (640x480,
100k-gaussian self-annealed scene, full fwd+bwd+Adam).

Rationale: the step is ~3%-of-roofline latency-bound in the per-pair
gather (one ~64B row per pair); tile_size=32 overlaps each splat with
~2-4x fewer tiles, shrinking the pair count (gather rows + sort keys)
at the cost of 4x pixels per tile-chunk block in the kernel — which the
saturation early-skip now bounds. Measures both and appends JSON to
val_runs/tile_ab_r3.jsonl.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    import bench

    rec = {}
    for ts in (16, 32):
        model = bench._scene(100_000, seed=3)
        ips, roofline = bench._train_iters_per_sec(
            model, 640, 480, n_warmup_train=300, n_iter=50, tile_size=ts
        )
        rec[f"ts{ts}"] = {"iters_per_sec": round(ips, 2), **roofline}
        print(f"tile_size={ts}: {ips:.2f} it/s, {roofline}", flush=True)

    os.makedirs("/root/repo/val_runs", exist_ok=True)
    with open("/root/repo/val_runs/tile_ab_r3.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
