#!/usr/bin/env python
"""TPU session 6: PROJ_BPS=16 A/B on the flagship (sampler grid-step
overhead experiment)."""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
# KSD_PROJ_BPS must be set before the kernels module imports.
os.environ["KSD_PROJ_BPS"] = "16"

import bench

os.environ.update({"BENCH_METHOD": "projective", "BENCH_BATCH": "1",
                   "BENCH_FRAMES": "96", "BENCH_MESH": "0",
                   "BENCH_COUNT": "0", "BENCH_BREAKDOWN": "0"})
print("=== projective B=1 BPS=16", flush=True)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
print(buf.getvalue().strip().splitlines()[-1], flush=True)

os.environ.update({"BENCH_METHOD": "fast", "BENCH_BATCH": "8"})
print("=== fast B=8 BPS=16", flush=True)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
print(buf.getvalue().strip().splitlines()[-1], flush=True)
