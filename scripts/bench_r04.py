#!/usr/bin/env python
"""Round-4 bench matrix: {projective, fast, merged} x {B=1, B=8} (+ vps=32)
in ONE process / one tunnel claim (scripts/bench_r03.py pattern).

r4 differences:
  - BENCH_COUNT=1 on EVERY row (VERDICT r3 weak #3: voxel_updates_per_s was
    recorded only for the flagship) — pays the counter pipeline's compile.
  - fast B=1 runs the staged-apply path at its own zero-overflow operating
    point (segment budget 32768; live segments ~19k at B=1 — the 98304
    default is sized for 8 fused frames).
  - serving-cycle timings (incremental mesh + batch ESDF) ride the two B=1
    streaming rows; throughput rows skip them (BENCH_CYCLES=0).
"""

import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

RUNS = [
    ("projective B=1", {"BENCH_METHOD": "projective", "BENCH_BATCH": "1"}),
    ("projective B=8", {"BENCH_METHOD": "projective", "BENCH_BATCH": "8",
                        "BENCH_CYCLES": "0"}),
    ("projective B=1 vps32", {"BENCH_METHOD": "projective",
                              "BENCH_BATCH": "1", "BENCH_VPS": "32",
                              "BENCH_CYCLES": "0"}),
    ("fast B=1 matched", {"BENCH_METHOD": "fast", "BENCH_BATCH": "1",
                          "BENCH_BAND": "matched", "BENCH_RAYS": "28672",
                          "BENCH_SEG": "32768"}),
    ("fast B=8 matched", {"BENCH_METHOD": "fast", "BENCH_BATCH": "8",
                          "BENCH_BAND": "matched", "BENCH_RAYS": "28672",
                          "BENCH_SEG": "98304", "BENCH_CYCLES": "0"}),
    ("merged B=1", {"BENCH_METHOD": "merged", "BENCH_BATCH": "1",
                    "BENCH_SEG": str(1 << 17), "BENCH_CYCLES": "0"}),
    ("merged B=8", {"BENCH_METHOD": "merged", "BENCH_BATCH": "8",
                    "BENCH_SEG": str(1 << 17), "BENCH_CYCLES": "0"}),
]

BASE = {"BENCH_FRAMES": "96", "BENCH_MESH": "1", "BENCH_COUNT": "1",
        "BENCH_BREAKDOWN": "0"}


def main():
    import bench

    results = []
    for name, env in RUNS:
        os.environ.update(BASE)
        for k in ("BENCH_METHOD", "BENCH_BATCH", "BENCH_VPS", "BENCH_RAYS",
                  "BENCH_SEG", "BENCH_BAND", "BENCH_CYCLES"):
            os.environ.pop(k, None)
        os.environ.update(env)
        print(f"=== {name}", flush=True)
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
        except Exception as e:  # keep the matrix going
            print(f"    FAILED: {e!r}", flush=True)
            results.append({"name": name, "error": repr(e)})
            continue
        line = buf.getvalue().strip().splitlines()[-1]
        row = json.loads(line)
        row["name"] = name
        row["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(row)
        print(json.dumps(row), flush=True)
    with open("BENCH_METHODS_r04.json", "w") as f:
        json.dump({"round": 4,
                   "device": "TPU v5e, 1 chip via axon tunnel",
                   "frames": int(BASE["BENCH_FRAMES"]),
                   "notes": [
                       "all rows: canonical config (0.05 m voxels, 640x480, "
                       "5 m ray, carving on, 21 labels), carve_mode="
                       "projective for ray methods",
                       "BENCH_COUNT=1 everywhere: voxel_updates_per_s is "
                       "recorded per row (VERDICT r3 weak #3)",
                       "fast/merged B=1 use the r4 staged Pallas RMW apply "
                       "(slow-scatter runtime regime fix, docs/DESIGN.md); "
                       "fast B=1 segment budget 32768 (live ~19k segments)",
                       "B=1 streaming rows carry serving-cycle timings "
                       "(incremental mesh cadence + batch ESDF)",
                   ],
                   "results": results}, f, indent=1)
    print("wrote BENCH_METHODS_r04.json", flush=True)


if __name__ == "__main__":
    main()
