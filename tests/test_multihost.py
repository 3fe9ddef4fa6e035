"""Multi-host streaming tests (parallel/multihost.py — BASELINE config 5).

1. Single-process: MultiHostPipeline over the virtual CPU mesh must produce
   the same fused voxel state as integrate_frames_sharded fed directly (the
   pipeline adds local->global placement + stacking on top).
2. Two-process: real `jax.distributed` bring-up with gloo CPU collectives in
   subprocesses — each "host" contributes its local frame slice via
   make_array_from_process_local_data and the sharded step runs the ray
   all_gather across process boundaries (the DCN path of SURVEY 2c/5.8).
   NB: jax.distributed.initialize must run before the first backend touch,
   so the worker initializes before importing the package.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models.common import Frame
from kimera_semantics_tpu.parallel import multihost, sharding

INTR = PinholeIntrinsics(fx=40.0, fy=40.0, cx=31.5, cy=23.5, width=64,
                         height=48)


def small_cfg():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=1024, dedup_table_size=1 << 12,
                                use_pallas=False),
    )


class TestSingleProcessPipeline:
    def test_pipeline_equals_direct_sharded(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 virtual devices")
        cfg = small_cfg()
        mesh = sharding.make_mesh(4)
        d = mesh.devices.size
        lmap = LabelColorMap.random()
        ds = SyntheticDataset(num_frames=2 * d, intr=INTR, label_map=lmap)
        frames = [ds.frame(i) for i in range(2 * d)]

        pipe = multihost.MultiHostPipeline(cfg, INTR, mesh=mesh)
        pipe.sgrid = sharding.create_sharded(cfg, mesh)
        out = pipe.run(iter(frames), max_steps=2)
        assert pipe.steps == 2

        # direct: same frames through integrate_frames_sharded
        sgrid = sharding.create_sharded(cfg, mesh)
        for s in range(2):
            batch = frames[s * d:(s + 1) * d]
            stacked = Frame(depth=jnp.stack([f.depth for f in batch]),
                            labels=jnp.stack([f.labels for f in batch]),
                            colors=jnp.stack([f.colors for f in batch]),
                            T_G_C=jnp.stack([f.T_G_C for f in batch]))
            stacked = jax.device_put(
                stacked, jax.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(sharding.AXIS)))
            sgrid = sharding.integrate_frames_sharded(sgrid, stacked, cfg,
                                                      INTR, mesh)

        np.testing.assert_allclose(np.asarray(out.wsum),
                                   np.asarray(sgrid.wsum), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.n_blocks),
                                      np.asarray(sgrid.n_blocks))
        merged, _ = sharding.merge_shards(out, cfg)
        assert int(merged.n_blocks) > 0
        assert float(np.asarray(merged.wsum).sum()) > 0


WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))
    pid = int(sys.argv[1]); port = sys.argv[2]
    # distributed bring-up MUST precede the first backend touch (package
    # import builds jnp constants)
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    from kimera_semantics_tpu.parallel import multihost
    from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                             PipelineConfig, TsdfConfig)
    from kimera_semantics_tpu.core.camera import PinholeIntrinsics
    from kimera_semantics_tpu.core.color import LabelColorMap
    from kimera_semantics_tpu.io.dataset import SyntheticDataset
    from kimera_semantics_tpu.models.common import Frame
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=1024, dedup_table_size=1 << 12,
                                use_pallas=False))
    intr = PinholeIntrinsics(fx=40.0, fy=40.0, cx=31.5, cy=23.5, width=64,
                             height=48)
    lmap = LabelColorMap.random()
    ds = SyntheticDataset(num_frames=4, intr=intr, label_map=lmap)
    pipe = multihost.MultiHostPipeline(cfg, intr)
    nloc = len(jax.local_devices())
    fr = [ds.frame(pid * nloc + i) for i in range(nloc)]
    local = Frame(depth=np.stack([np.asarray(f.depth) for f in fr]),
                  labels=np.stack([np.asarray(f.labels) for f in fr]),
                  colors=np.stack([np.asarray(f.colors) for f in fr]),
                  T_G_C=np.stack([np.asarray(f.T_G_C) for f in fr]))
    sgrid = pipe.step(local)
    total_w = float(jax.jit(lambda g: jnp.sum(g.wsum))(sgrid))
    total_blocks = int(jax.jit(lambda g: jnp.sum(g.n_blocks))(sgrid))
    print("RESULT", pid, total_w, total_blocks, flush=True)
""")


class TestTwoProcessDistributed:
    def test_gloo_two_process_step(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "worker.py"
        script.write_text(WORKER.format(repo=repo))
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        procs = [subprocess.Popen([sys.executable, str(script), str(i), port],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, env=env, text=True)
                 for i in range(2)]
        outs = []
        try:
            for p in procs:
                out, err = p.communicate(timeout=300)
                outs.append((p.returncode, out, err))
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("distributed CPU run timed out on this machine")
        for rc, out, err in outs:
            if rc != 0 and ("gloo" in err.lower()
                            or "Unimplemented" in err):
                pytest.skip(f"gloo CPU collectives unavailable: {err[-300:]}")
            assert rc == 0, f"worker failed:\n{err[-2000:]}"
        results = [l for rc, out, _ in outs for l in out.splitlines()
                   if l.startswith("RESULT")]
        assert len(results) == 2
        # both processes see the same replicated global reductions over the
        # 2-host x 2-device sharded grid
        w = [float(r.split()[2]) for r in results]
        b = [int(r.split()[3]) for r in results]
        assert abs(w[0] - w[1]) < 1e-3 * max(abs(w[0]), 1.0)
        assert b[0] == b[1] and b[0] > 0 and w[0] > 0


class TestProjectivePipeline:
    def test_projective_method(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 virtual devices")
        cfg = small_cfg()
        mesh = sharding.make_mesh(2)
        lmap = LabelColorMap.random()
        ds = SyntheticDataset(num_frames=2, intr=INTR, label_map=lmap)
        pipe = multihost.MultiHostPipeline(cfg, INTR, mesh=mesh,
                                           method="projective")
        pipe.run(iter([ds.frame(0), ds.frame(1)]), max_steps=1)
        merged, _ = sharding.merge_shards(pipe.sgrid, cfg)
        assert int(merged.n_blocks) > 0
        with pytest.raises(ValueError):
            multihost.MultiHostPipeline(cfg, INTR, mesh=mesh, method="bogus")
