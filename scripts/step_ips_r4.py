"""Quick headline check: 480p/100k full-step it/s at ts=16 (current tree)."""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import bench
    model = bench._scene(100_000, seed=3)
    ips, roofline = bench._train_iters_per_sec(
        model, 640, 480, n_warmup_train=300, n_iter=50, tile_size=16)
    rec = {"ts16_ips": round(ips, 2), **roofline}
    print(json.dumps(rec), flush=True)
    with open("/root/repo/val_runs/step_ips_r4.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")

if __name__ == "__main__":
    main()
