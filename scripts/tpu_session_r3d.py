#!/usr/bin/env python
"""TPU session 5: flagship e2e + alloc stages with the Pallas block-DDA
candidate walk, then one projective B=1 bench row."""
import contextlib
import faulthandler
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

print("######## alloc stages (block-DDA kernel)", flush=True)
import profile_atlas
profile_atlas.main()
faulthandler.cancel_dump_traceback_later()

print("######## projective B=1 bench", flush=True)
import bench
os.environ.update({"BENCH_METHOD": "projective", "BENCH_BATCH": "1",
                   "BENCH_FRAMES": "96", "BENCH_MESH": "1",
                   "BENCH_COUNT": "0", "BENCH_BREAKDOWN": "0"})
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
print(buf.getvalue().strip().splitlines()[-1], flush=True)
