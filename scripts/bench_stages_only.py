"""Quick per-stage throughput measurement (bench.py's stage table only).

Round-3 use: measure whether the UNROLLED fb=4 static step beats 4 single
steps on one chip (VERDICT r2 'frame batching loses throughput' item)
without paying for the full bench. Prints one JSON line and appends to
val_runs/stage_bench.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stage_iters_per_sec  # noqa: E402


def main():
    t0 = time.time()
    stages = _stage_iters_per_sec()
    rec = {"stage_iters_per_sec_480p": stages,
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(rec), flush=True)
    os.makedirs("/root/repo/val_runs", exist_ok=True)
    with open("/root/repo/val_runs/stage_bench.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
