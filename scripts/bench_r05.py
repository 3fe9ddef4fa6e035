#!/usr/bin/env python
"""Round-5 bench matrix: {projective, fast, merged} x {B=1, B=8} (+ vps=32,
+ streaming-cadence variants) in ONE process / one tunnel claim
(scripts/bench_r04.py pattern).

r5 differences:
  - Streaming rows carry the pipelined live-mesh loop
    (stream_with_mesh_fps / mesh_stall_ms_per_cycle / mesh_hz) and the
    periodic-ESDF cycle; a cadence-20 flagship row shows the >=100 fps
    with-live-mesh operating point (the tunnel's ~58 ms/cycle sync+fetch
    floor caps cadence-10).
  - fast B=8 rides the B-scaled staged RMW apply (the r4 regression fix).
  - merged B=1 runs segment budget 65536 (attribution r5: staging scatters
    walk the full budget serially — profile_apply_r5).
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
    ("projective B=1 cadence20", {"BENCH_METHOD": "projective",
                                  "BENCH_BATCH": "1", "BENCH_CADENCE": "20",
                                  "BENCH_COUNT": "0", "BENCH_MESH": "0"}),
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
                    "BENCH_SEG": "65536"}),
    ("merged B=8", {"BENCH_METHOD": "merged", "BENCH_BATCH": "8",
                    "BENCH_SEG": str(1 << 17), "BENCH_CYCLES": "0"}),
]

BASE = {"BENCH_FRAMES": "96", "BENCH_MESH": "1", "BENCH_COUNT": "1",
        "BENCH_BREAKDOWN": "0"}
CLEAR = ("BENCH_METHOD", "BENCH_BATCH", "BENCH_VPS", "BENCH_RAYS",
         "BENCH_SEG", "BENCH_BAND", "BENCH_CYCLES", "BENCH_CADENCE",
         "BENCH_COUNT", "BENCH_MESH")


def main():
    import bench

    results = []
    for name, env in RUNS:
        for k in CLEAR:
            os.environ.pop(k, None)
        os.environ.update(BASE)
        os.environ.update(env)
        # The flagship row keeps the clean stage breakdown (r5 async form).
        os.environ["BENCH_BREAKDOWN"] = ("1" if name == "projective B=1"
                                         else "0")
        print(f"=== {name}", flush=True)
        buf = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
            row = json.loads(buf.getvalue().strip().splitlines()[-1])
            row["row"] = name
            row["wall_s"] = round(time.time() - t0, 1)
            results.append(row)
            print(json.dumps(row), flush=True)
        except Exception as e:  # keep the matrix going
            print(json.dumps({"row": name, "error": repr(e)[:500]}),
                  flush=True)
    with open("BENCH_METHODS_r05.json", "w") as f:
        json.dump({"rows": results}, f, indent=1)
    print(f"wrote BENCH_METHODS_r05.json ({len(results)} rows)")


if __name__ == "__main__":
    main()
