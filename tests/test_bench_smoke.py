"""bench.py driver smoke test.

The driver runs `python bench.py` on the real TPU at the end of every round;
a crash there silently costs the headline metric. BENCH_SMOKE=1 runs the
identical driver code (config plumbing, warmup, timing loop, update counter,
mesh-quality tail, JSON output) on tiny geometry, CPU-runnable in seconds.
Kernel-level correctness is covered by the oracle/pallas/projective suites —
this only guards the bench harness itself.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update({
        "BENCH_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        "BENCH_PALLAS": "0",
        "JAX_COMPILATION_CACHE_DIR":
            os.path.expanduser("~/.cache/jax_ksd_tests"),
    })
    env.pop("XLA_FLAGS", None)  # no virtual device mesh in the subprocess
    env.update(extra_env)
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, timeout=600,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, (
        f"bench.py crashed:\n{proc.stdout}\n{proc.stderr}")
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.parametrize("method", ["projective", "fast", "merged"])
def test_bench_smoke(method):
    out = _run_bench({"BENCH_METHOD": method})
    assert out["unit"] == "frames/s"
    assert out["value"] > 0
    assert out["metric"].startswith(method)
    assert out["overflow"] == 0
    assert out["dropped_rays"] == 0
    assert out["blocks_allocated"] > 0
    assert out["voxel_updates_per_s"] > 0


def test_bench_smoke_batched():
    out = _run_bench({"BENCH_METHOD": "projective", "BENCH_BATCH": "2",
                      "BENCH_FRAMES": "4"})
    assert out["batch"] == 2 and out["value"] > 0


def test_bench_smoke_cycles():
    """Serving-cycle section (VERDICT r3 item 4): incremental mesh cycle +
    batch-ESDF timings ride the bench output."""
    out = _run_bench({"BENCH_METHOD": "projective", "BENCH_CYCLES": "2",
                      "BENCH_CADENCE": "2", "BENCH_FRAMES": "4",
                      "BENCH_COUNT": "0"})
    assert out["mesh_cycle_ms"] > 0
    assert out["esdf_batch_ms"] > 0
    assert out["mesh_cadence_frames"] == 2
    assert "mesh_keeps_up" in out
