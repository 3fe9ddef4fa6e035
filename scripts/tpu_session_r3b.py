#!/usr/bin/env python
"""TPU session 3: atlas pooling micro-bench, then the BENCH_r03 matrix
re-run on the trash-row-fixed code (clean mesh-error columns)."""
import faulthandler
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

print("######## atlas variants", flush=True)
import profile_atlas
profile_atlas.main()
faulthandler.cancel_dump_traceback_later()

print("######## bench matrix (trash-fixed)", flush=True)
import bench_r03
bench_r03.main()
