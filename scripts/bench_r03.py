#!/usr/bin/env python
"""Round-3 bench matrix: {projective, fast, merged} x {B=1, B=8} (+ vps=32)
in ONE process / one tunnel claim (fresh bench.py processes each pay full
compile AND the tunnel's post-exit claim refusal — CLAUDE.md tunnel ops).

Each row is the unmodified bench.py driver with env overrides; output rows
collect into BENCH_METHODS_r03.json. Runtime ~1 h (compiles dominate).
"""

import importlib
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
    # Flagship first (headline parity with the driver's own bench.py run).
    ("projective B=1", {"BENCH_METHOD": "projective", "BENCH_BATCH": "1"}),
    ("projective B=8", {"BENCH_METHOD": "projective", "BENCH_BATCH": "8"}),
    ("projective B=1 vps32", {"BENCH_METHOD": "projective",
                              "BENCH_BATCH": "1", "BENCH_VPS": "32"}),
    ("fast B=8 matched", {"BENCH_METHOD": "fast", "BENCH_BATCH": "8",
                          "BENCH_BAND": "matched", "BENCH_RAYS": "28672",
                          "BENCH_SEG": str(1 << 17)}),
    ("fast B=1 matched", {"BENCH_METHOD": "fast", "BENCH_BATCH": "1",
                          "BENCH_BAND": "matched", "BENCH_RAYS": "28672",
                          "BENCH_SEG": str(1 << 17)}),
    ("fast B=8 matched seg98k", {"BENCH_METHOD": "fast", "BENCH_BATCH": "8",
                                 "BENCH_BAND": "matched",
                                 "BENCH_RAYS": "28672",
                                 "BENCH_SEG": "98304"}),
    ("fast B=8 octave(57344)", {"BENCH_METHOD": "fast", "BENCH_BATCH": "8",
                                "BENCH_RAYS": "57344",
                                "BENCH_SEG": str(1 << 18)}),
    ("merged B=8", {"BENCH_METHOD": "merged", "BENCH_BATCH": "8",
                    "BENCH_SEG": str(1 << 17)}),
    ("merged B=1", {"BENCH_METHOD": "merged", "BENCH_BATCH": "1",
                    "BENCH_SEG": str(1 << 17)}),
]

BASE = {"BENCH_FRAMES": "96", "BENCH_MESH": "1", "BENCH_COUNT": "0",
        "BENCH_BREAKDOWN": "0"}
# BENCH_COUNT=0: the untimed counter pipeline doubles each row's compile;
# the r02 artifact carries the per-method update counters at this config and
# the unit-of-work definitions are unchanged. Overflow/drop counters (the
# honesty gate) ride the timed pipeline itself.


def main():
    import bench

    results = []
    for name, env in RUNS:
        os.environ.update(BASE)
        for k in ("BENCH_METHOD", "BENCH_BATCH", "BENCH_VPS", "BENCH_RAYS",
                  "BENCH_SEG", "BENCH_BAND"):
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
    with open("BENCH_METHODS_r03.json", "w") as f:
        json.dump({"round": 3,
                   "device": "TPU v5e, 1 chip via axon tunnel",
                   "frames": int(BASE["BENCH_FRAMES"]),
                   "notes": [
                       "all rows: canonical config (0.05 m voxels, 640x480, "
                       "5 m ray, carving on, 21 labels), carve_mode="
                       "projective for ray methods",
                       "fast matched rows: band_density=matched "
                       "(reference-exact dedup density, config.py) — zero "
                       "dropped rays at the 28672 budget",
                       "fast octave row: conservative octave keep needs a "
                       "57344 budget for zero drops (max keeps 57.7k)",
                       "segment_budget sized to unique segments, not "
                       "stream size (scatters walk the budget serially)",
                   ],
                   "results": results}, f, indent=1)
    print("wrote BENCH_METHODS_r03.json", flush=True)


if __name__ == "__main__":
    main()
