"""Regenerate tests/fixtures/golden_map.vxblx — the pinned .vxblx wire-format
fixture (VERDICT r1 item 7). Deterministic: the grid comes from
tests.test_vxblx.make_grid (seeded) and the blocked ESDF from it. Only
regenerate on a deliberate wire-format change, and update the pinned SHA256 in
tests/test_vxblx.py alongside."""
import sys, os, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

from tests.test_vxblx import small_cfg, make_grid
from kimera_semantics_tpu.io import vxblx
from kimera_semantics_tpu.ops import esdf as esdf_ops

out = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "fixtures",
                   "golden_map.vxblx")
cfg = small_cfg()
g = make_grid(cfg)
res = esdf_ops.compute_esdf_blocked(g, cfg, max_dist=1.0)
vxblx.save_vxblx(out, g, cfg, esdf=res)
print(out, os.path.getsize(out),
      hashlib.sha256(open(out, "rb").read()).hexdigest())
