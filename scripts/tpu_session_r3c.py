#!/usr/bin/env python
"""TPU session 4: alloc-split micro-bench + refreshed batched rows on the
batched-allocation code (bench_r03 rows re-run; other rows keep session-3
values)."""
import faulthandler
import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

print("######## atlas/alloc split", flush=True)
import profile_atlas
profile_atlas.main()
faulthandler.cancel_dump_traceback_later()

print("######## refreshed batched rows", flush=True)
import bench

RUNS = [
    ("projective B=8 batched-alloc",
     {"BENCH_METHOD": "projective", "BENCH_BATCH": "8"}),
    ("fast B=8 matched batched-alloc",
     {"BENCH_METHOD": "fast", "BENCH_BATCH": "8", "BENCH_BAND": "matched",
      "BENCH_RAYS": "28672", "BENCH_SEG": "98304"}),
    ("merged B=8 batched-alloc",
     {"BENCH_METHOD": "merged", "BENCH_BATCH": "8",
      "BENCH_SEG": str(1 << 17)}),
]
BASE = {"BENCH_FRAMES": "96", "BENCH_MESH": "1", "BENCH_COUNT": "0",
        "BENCH_BREAKDOWN": "0"}
rows = []
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
    except Exception as e:
        print(f"    FAILED: {e!r}", flush=True)
        rows.append({"name": name, "error": repr(e)})
        continue
    row = json.loads(buf.getvalue().strip().splitlines()[-1])
    row["name"] = name
    row["wall_s"] = round(time.perf_counter() - t0, 1)
    rows.append(row)
    print(json.dumps(row), flush=True)
with open("BENCH_BATCHED_r03.json", "w") as f:
    json.dump({"round": 3, "note": "batched-allocation refresh rows",
               "results": rows}, f, indent=1)
print("wrote BENCH_BATCHED_r03.json", flush=True)
