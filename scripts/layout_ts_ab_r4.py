"""2x2 on-TPU A/B: {tile_size 16, 32} x {scatter, gather} layout on the
480p/100k headline step. Appends one JSON line to
val_runs/layout_ts_ab_r4.jsonl."""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    import bench
    rec = {}
    for ts in (16, 32):
        for scatter in (True, False):
            model = bench._scene(100_000, seed=3)
            ips, roofline = bench._train_iters_per_sec(
                model, 640, 480, n_warmup_train=300, n_iter=50,
                tile_size=ts,
                tile_cfg_overrides={"scatter_layout": scatter})
            key = f"ts{ts}_{'scatter' if scatter else 'gather'}"
            rec[key] = round(ips, 2)
            print(key, ips, flush=True)
    with open("/root/repo/val_runs/layout_ts_ab_r4.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)

if __name__ == "__main__":
    main()
