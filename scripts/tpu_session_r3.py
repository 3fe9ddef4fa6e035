#!/usr/bin/env python
"""One-claim TPU session: projective roofline + the BENCH_r03 matrix,
sequentially in one process (separate processes would each pay the tunnel's
post-exit claim refusal)."""
import faulthandler
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

print("######## projective roofline", flush=True)
import profile_projective_r3
profile_projective_r3.main()
faulthandler.cancel_dump_traceback_later()

print("######## bench matrix", flush=True)
import bench_r03
bench_r03.main()
