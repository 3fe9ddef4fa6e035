"""SemanticTsdfServer equivalent: the streaming fusion pipeline.

Mirrors the reference server surface (SemanticTsdfServer subclassing
vxb::TsdfServer, semantic_tsdf_server.cpp:49-77) without ROS: a frame loop with
  - message throttling (`min_time_between_msgs_sec`, TsdfServer behavior),
  - integrator dispatch via the factory (semantic_tsdf_server.cpp:71-77),
  - periodic incremental mesh updates (`update_mesh_every_n_sec` -> here
    every-N-frames, timer-driven behavior of launch:131),
  - mesh generation + PLY save, grid save/load (kimera_semantics_rosbag.cpp:148-167),
  - per-phase timing (vxb::timing parity, utils/timing.py).

The host loop overlaps rendering/IO of frame t+1 with device compute of frame t
(JAX dispatch is async; we only block on grid state at mesh/stat boundaries).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from ..config import FusionConfig
from ..core.camera import PinholeIntrinsics
from ..core.color import LabelColorMap
from ..grid import blocks as gblocks
from ..io import ply as ply_io
from ..io import serial as serial_io
from ..models import factory
from ..models.common import Frame
from ..ops import mesh as mesh_ops
from ..utils import timing


@dataclasses.dataclass
class ServerConfig:
    mesh_every_n_frames: int = 0      # 0 = no periodic meshing
    min_frame_interval: float = 0.0   # seconds of *stream time* between frames
    mesh_filename: str = ""
    mesh_connected: bool = False      # vertex-deduplicated (connected)
                                      # meshes on generate_mesh outputs —
                                      # voxblox MeshLayer getConnectedMesh
                                      # (~6x smaller PLYs)
    mesh_normals: bool = False        # per-vertex TSDF-gradient normals on
                                      # extracted meshes (voxblox Mesh
                                      # normals; written into the PLY)
    enable_icp: bool = False          # scan-to-map pose refinement before
                                      # integration (voxblox enable_icp parity)
    icp_iters: int = 6
    icp_subsample: int = 16           # every Nth backprojected pixel feeds the
                                      # solver (voxblox icp subsampling)
    icp_refine_roll_pitch: bool = True  # False: constrain to yaw+translation
                                      # (voxblox icp_refine_roll_pitch)
    icp_damping: float = 1e-3         # Levenberg damping on the GN Hessian
    icp_min_match_ratio: float = 0.1  # reject refinement when fewer than this
                                      # fraction of valid points hit observed
                                      # in-band TSDF (poor-overlap guard)
    prefetch_depth: int = 2           # frames decoded ahead of the device by
                                      # a producer thread (0 = synchronous);
                                      # the ROS-queue analogue (io/prefetch.py)
    esdf_max_dist: float = 4.0        # ESDF saturation distance in meters
                                      # (voxblox esdf_max_distance_m)
    esdf_every_n_frames: int = 0      # periodic ESDF refresh while streaming
                                      # (voxblox EsdfServer update cycle; the
                                      # result is kept on `server.esdf`).
                                      # 0 = batch-only (CS2 tail via --esdf)
    log_every_n_frames: int = 0       # glog-style per-frame progress lines to
                                      # stderr (kimera_semantics_rosbag.cpp:79
                                      # logs every frame; 0 = quiet)
    stats_jsonl: str = ""             # per-frame metrics sink: one JSON line
                                      # per integrated frame (observability
                                      # parity, SURVEY 5.5)
    live_mesh_path: str = ""          # stream mode: atomically rewrite this
                                      # PLY with the FULL growing mesh at each
                                      # periodic mesh update (rviz incremental
                                      # mesh topic equivalent, launch:131)
    live_mesh_keep: int = 0           # also keep N rotating snapshots
    live_mesh_port: int = -1          # >=0: serve the live mesh over HTTP
                                      # (/, /mesh.ply, /stats.json); 0 picks
                                      # a free port (server/viz.py)
    async_mesh: bool = True           # pipelined periodic meshing (r5): the
                                      # cycle program is dispatched inline
                                      # against the grid snapshot and the
                                      # sync/fetch/cache/IO run on a worker
                                      # thread, overlapping the next frames'
                                      # integration. The stream only stalls
                                      # if a cycle is still in flight when
                                      # the next one is due (counted in
                                      # mesh_stall_s). False = synchronous
                                      # update_mesh (r4 behavior)


class SemanticTsdfServer:
    def __init__(self, cfg: FusionConfig, intr: PinholeIntrinsics,
                 label_map: Optional[LabelColorMap] = None,
                 server_cfg: Optional[ServerConfig] = None):
        self.cfg = cfg
        self.intr = intr
        self.label_map = label_map or LabelColorMap.random(cfg.grid.num_labels)
        self.server_cfg = server_cfg or ServerConfig()
        self.integrator = factory.create(cfg.integrator, cfg, intr)
        self.grid = gblocks.create(cfg)
        self._frames_integrated = 0
        self._last_stream_time = -np.inf
        self.mesh_callbacks: List[Callable[[mesh_ops.Mesh], None]] = []
        self.esdf = None  # latest periodic EsdfResult (esdf_every_n_frames)
        self.last_icp_match_ratio = None  # fraction of points on observed
                                          # in-band TSDF at the last ICP
        # Live incremental-mesh surface (server/viz.py): a MeshLayer-style
        # per-block cache feeding an atomic PLY writer and/or HTTP streamer.
        self.mesh_cache = None
        self._live_writer = None
        self.live_streamer = None
        self._mesh_worker = None    # in-flight pipelined mesh cycle
        self.mesh_stall_s = 0.0     # stream time spent waiting on a cycle
                                    # still in flight when the next was due
        sc = self.server_cfg
        if sc.live_mesh_path or sc.live_mesh_port >= 0:
            from . import viz
            self.mesh_cache = viz.MeshLayerCache()
            if sc.live_mesh_path:
                self._live_writer = viz.LiveMeshWriter(sc.live_mesh_path,
                                                       keep=sc.live_mesh_keep)
            if sc.live_mesh_port >= 0:
                self.live_streamer = viz.MeshHTTPStreamer(sc.live_mesh_port)

    # -- streaming ---------------------------------------------------------

    def insert_frame(self, frame: Frame, stream_time: Optional[float] = None
                     ) -> bool:
        """Integrate one frame; returns False if throttled
        (min_time_between_msgs_sec behavior)."""
        if (stream_time is not None and
                stream_time - self._last_stream_time <
                self.server_cfg.min_frame_interval):
            return False
        if stream_time is not None:
            self._last_stream_time = stream_time
        if self.server_cfg.enable_icp and self._frames_integrated > 0:
            frame = self._refine_pose(frame)
        t = timing.Timer(f"integrate/{self.cfg.integrator.value}")
        self.grid = self.integrator.integrate(self.grid, frame)
        t.stop(sync=self.grid.wsum)
        self._frames_integrated += 1
        n = self.server_cfg.mesh_every_n_frames
        if n and self._frames_integrated % n == 0:
            if self.server_cfg.async_mesh:
                self.update_mesh_async()
            else:
                self.update_mesh()
        ne = self.server_cfg.esdf_every_n_frames
        if ne and self._frames_integrated % ne == 0:
            self.update_esdf()
        return True

    def run(self, dataset, max_frames: Optional[int] = None) -> int:
        """Batch mode — the kimera_semantics_rosbag main loop (CS2). Frame
        decode runs on a prefetch thread (io/prefetch.py) so host IO overlaps
        device compute."""
        import itertools
        import json
        import sys
        import time
        from ..io.prefetch import prefetch
        count = 0
        # plain iterables/generators are fine as datasets — sized ones just
        # get a nicer "i/N" progress denominator
        n = len(dataset) if hasattr(dataset, "__len__") else None
        total = (min(n, max_frames) if (n is not None and max_frames)
                 else (n if n is not None else (max_frames or "?")))
        log_n = self.server_cfg.log_every_n_frames
        sink = (open(self.server_cfg.stats_jsonl, "w")
                if self.server_cfg.stats_jsonl else None)
        t0 = time.perf_counter()
        try:
            stream = itertools.islice(iter(dataset), max_frames)
            for frame in prefetch(stream, self.server_cfg.prefetch_depth):
                self.insert_frame(frame)
                count += 1
                # progress/metrics read device state (a blocking fetch per
                # line) — both sinks are opt-in and cost ~one tunnel RTT
                if log_n and count % log_n == 0:
                    print(f"Integrating frame {count}/{total} "
                          f"(blocks={int(self.grid.n_blocks)}, "
                          f"{count / (time.perf_counter() - t0):.1f} fps)",
                          file=sys.stderr)
                if sink is not None:
                    sink.write(json.dumps({
                        "frame": count,
                        "t_wall_s": round(time.perf_counter() - t0, 4),
                        "blocks": int(self.grid.n_blocks),
                        "overflow": int(self.grid.overflow),
                        "dropped_rays": int(self.grid.dropped_rays)}) + "\n")
        finally:
            self.join_mesh()
            if getattr(self, "_mesh_retry_updated", None) is not None:
                # The stream's last pipelined cycle failed — complete it
                # synchronously so the live mesh doesn't end stale.
                self.update_mesh()
            if sink is not None:
                sink.close()
        return count

    def _refine_pose(self, frame: Frame) -> Frame:
        """Scan-to-map TSDF alignment (ops/icp.py) — voxblox enable_icp."""
        from ..core import camera as cam
        from ..ops import icp as icp_ops
        sc = self.server_cfg
        with timing.Timer("icp/align"):
            pts_C, valid = cam.backproject(frame.depth, self.intr)
            stride = max(1, sc.icp_subsample)
            pts_C, valid = pts_C[::stride], valid[::stride]
            T, _, self.last_icp_match_ratio = icp_ops.align_to_map(
                self.grid, self.cfg, pts_C, valid, frame.T_G_C,
                iters=sc.icp_iters, damping=sc.icp_damping,
                refine_roll_pitch=sc.icp_refine_roll_pitch,
                min_match_ratio=sc.icp_min_match_ratio)
        return dataclasses.replace(frame, T_G_C=T)

    # -- meshing / output --------------------------------------------------

    def update_mesh(self) -> mesh_ops.Mesh:
        """Incremental mesh over blocks updated since the last call
        (synchronous)."""
        import jax.numpy as jnp
        self.join_mesh()
        retry = getattr(self, "_mesh_retry_updated", None)
        if retry is not None:
            # A failed pipelined cycle left blocks un-meshed (flags were
            # cleared at its dispatch): fold them back in so no path —
            # sync update, stream teardown, manual call — drops them.
            self._mesh_retry_updated = None
            self.grid = dataclasses.replace(
                self.grid, updated=self.grid.updated | retry)
        with timing.Timer("mesh/update"):
            out = mesh_ops.extract_mesh(self.grid, self.cfg, self.label_map,
                                        only_updated=True,
                                        with_normals=self.server_cfg.mesh_normals,
                                        return_blocks=self.mesh_cache is not None)
        self.grid = dataclasses.replace(
            self.grid, updated=jnp.zeros(self.grid.updated.shape, dtype=bool))
        return self._publish_mesh(out)

    def update_mesh_async(self) -> None:
        """Pipelined incremental mesh (r5): dispatch the cycle program
        against the current grid snapshot, clear the updated flags, and
        run the sync/fetch/publish on a worker thread so integration of
        the next frames overlaps the >=23 ms tunnel sync + fetch. A cycle
        still in flight when the next is due stalls the stream (counted
        in `mesh_stall_s` — the keeps-up measure)."""
        import threading
        import time as _time
        import jax.numpy as jnp
        t0 = _time.perf_counter()
        self.join_mesh()                       # previous cycle must land
        self.mesh_stall_s += _time.perf_counter() - t0
        retry = getattr(self, "_mesh_retry_updated", None)
        if retry is not None:
            # Previous pipelined cycle couldn't complete without the grid
            # snapshot (budget overflow / >kmax blocks): its blocks rejoin
            # this cycle's updated set and the extraction runs
            # synchronously (complete by construction).
            self._mesh_retry_updated = None
            self.grid = dataclasses.replace(
                self.grid, updated=self.grid.updated | retry)
            self.update_mesh()
            return
        old_updated = self.grid.updated
        # hold_grid=False: a live python ref on the grid arrays would
        # defeat the integrators' buffer donation for every frame
        # integrated while the cycle is in flight (ops/mesh.py).
        collect = mesh_ops.extract_mesh_cycle_async(
            self.grid, self.cfg, self.label_map, only_updated=True,
            with_normals=self.server_cfg.mesh_normals,
            return_blocks=self.mesh_cache is not None,
            hint_rows=getattr(self, "_mesh_fetch_hint", 4096),
            hold_grid=False,
            page_blocks=getattr(self, "_mesh_page_hint", 256))

        self.grid = dataclasses.replace(
            self.grid, updated=jnp.zeros(self.grid.updated.shape, dtype=bool))

        def work():
            out = collect()
            if out is None:
                self._mesh_retry_updated = old_updated
                # Grow the page for the retry's successors.
                self._mesh_page_hint = getattr(self, "_mesh_page_hint",
                                               256) + 256
                return
            self._publish_mesh(out)
            self._mesh_fetch_hint = getattr(collect, "total_rows", 4096)
            if self.mesh_cache is not None:
                nblk = len(out[1])
                self._mesh_page_hint = max(
                    256, -(-int(nblk * 1.3) // 256) * 256)

        self._mesh_worker = threading.Thread(target=work, daemon=True)
        self._mesh_worker.start()

    def join_mesh(self):
        """Block until the in-flight pipelined mesh cycle (if any) lands."""
        w = getattr(self, "_mesh_worker", None)
        if w is not None:
            w.join()
            self._mesh_worker = None

    def _publish_mesh(self, out) -> mesh_ops.Mesh:
        if self.mesh_cache is not None:
            m, meshed_rows, tri_rows = out
            self.mesh_cache.update(m, meshed_rows, tri_rows)
            full = self.mesh_cache.full_mesh()
            if self._live_writer is not None:
                self._live_writer.write(full)
            if self.live_streamer is not None:
                self.live_streamer.publish(
                    full, version=self.mesh_cache.version,
                    blocks=self.mesh_cache.num_blocks,
                    frames=self._frames_integrated)
        else:
            m = out
        for cb in self.mesh_callbacks:
            cb(m)
        return m

    def update_esdf(self):
        """Refresh the ESDF from the current TSDF state — the EsdfServer
        update cycle (voxblox updates ESDF alongside streaming TSDF; here a
        full jump-flooding pass over the allocated AABB, ops/esdf.py, which
        on TPU is cheaper than maintaining an incremental wavefront)."""
        from ..ops import esdf as esdf_ops
        with timing.Timer("esdf/update"):
            # Block-sparse: memory bounded by allocated blocks, not the
            # scene AABB (corridor-scale maps — VERDICT r1 item 5).
            self.esdf = esdf_ops.compute_esdf_blocked(
                self.grid, self.cfg, max_dist=self.server_cfg.esdf_max_dist)
        return self.esdf

    def generate_mesh(self, path: Optional[str] = None) -> mesh_ops.Mesh:
        """Full mesh over all allocated blocks (+ optional PLY save) —
        TsdfServer::generateMesh (kimera_semantics_rosbag.cpp:148)."""
        self.join_mesh()
        with timing.Timer("mesh/generate"):
            m = mesh_ops.extract_mesh(self.grid, self.cfg, self.label_map,
                                      only_updated=False,
                                      with_normals=self.server_cfg.mesh_normals)
            if self.server_cfg.mesh_connected:
                m = mesh_ops.connect_mesh(m, self.cfg.grid.voxel_size)
        path = path or self.server_cfg.mesh_filename
        if path:
            ply_io.write_ply(path, m.vertices, m.colors, m.triangles,
                             normals=m.normals)
        return m

    # -- pointcloud outputs (TsdfServer publishPointclouds parity) ----------

    def _voxel_centers(self, slot_idx: np.ndarray, lin_idx: np.ndarray
                       ) -> np.ndarray:
        """World-space centers for (slot, linear-voxel) index pairs."""
        g = self.cfg.grid
        V = g.voxels_per_side
        bc = np.asarray(self.grid.block_coords)[slot_idx]         # (N, 3)
        local = np.stack([lin_idx // (V * V), (lin_idx // V) % V,
                          lin_idx % V], axis=-1)
        return ((bc * V + local) + 0.5).astype(np.float32) * g.voxel_size

    def _observed(self):
        cap = self.cfg.grid.block_capacity
        nb = int(self.grid.n_blocks)
        w = np.array(self.grid.wsum[:cap])  # copy: unallocated slots zeroed
        w[nb:] = 0.0
        d = np.asarray(gblocks.tsdf_distance(
            self.grid, self.cfg.tsdf.truncation_distance)[:cap])
        return w, d

    def surface_pointcloud(self, thresh: Optional[float] = None):
        """(points (N,3), colors (N,3) u8) of near-surface observed voxels —
        the reference's `surface_pointcloud` topic (voxblox TsdfServer
        publishes voxels within ~half a voxel of the zero crossing, colored
        like the mesh)."""
        from ..ops import mesh as mesh_ops
        g = self.cfg.grid
        thresh = g.voxel_size * 0.75 if thresh is None else thresh
        w, d = self._observed()
        slot, lin = np.nonzero((w > 1e-6) & (np.abs(d) < thresh))
        # gather the N selected colors on device (materializing the full
        # (3, rows, V3) color volume on the host would be a ~GB fetch);
        # indices are padded to the next power of two so the eager gather
        # compiles O(log N) distinct shapes, not one per call
        n = len(slot)
        pad = max(1, 1 << (n - 1).bit_length()) if n else 1
        sp = np.zeros(pad, np.int64)
        lp = np.zeros(pad, np.int64)
        sp[:n], lp[:n] = slot, lin
        cols = np.asarray(mesh_ops.render_colors(
            self.grid, self.cfg, self.label_map)[:, sp, lp]).T[:n]
        return (self._voxel_centers(slot, lin),
                np.clip(cols, 0, 255).astype(np.uint8))

    def tsdf_pointcloud(self):
        """(points (N,3), distances (N,)) for every observed voxel — the
        `tsdf_pointcloud` debug topic."""
        w, d = self._observed()
        slot, lin = np.nonzero(w > 1e-6)
        return self._voxel_centers(slot, lin), d[slot, lin]

    def freespace_pointcloud(self, min_distance: Optional[float] = None):
        """(points (N,3),) of confidently-free observed voxels — the
        `freespace_pointcloud` topic Kimera remaps for planning
        (launch/kimera_semantics_rosbag.launch:53). Default threshold: the
        truncation distance (distance saturated = definitely free)."""
        t = self.cfg.tsdf.truncation_distance
        min_distance = t * 0.95 if min_distance is None else min_distance
        w, d = self._observed()
        slot, lin = np.nonzero((w > 1e-6) & (d >= min_distance))
        return self._voxel_centers(slot, lin)

    # -- checkpointing -----------------------------------------------------

    def save_map(self, path: str, esdf=None):
        """saveMap. A `.vxblx` extension selects the voxblox-compatible wire
        format (kimera_semantics_rosbag.cpp:150 writes tsdf_esdf.vxblx;
        the optional `esdf` result appends the second layer section).
        Any other extension uses the native KSDV container, which — unlike
        .vxblx — round-trips the semantic channels too."""
        self.join_mesh()
        if path.endswith(".vxblx"):
            from ..io import vxblx as vxblx_io
            vxblx_io.save_vxblx(path, self.grid, self.cfg, esdf=esdf)
        else:
            serial_io.save_grid(path, self.grid)

    def load_map(self, path: str):
        if path.endswith(".vxblx"):
            from ..io import vxblx as vxblx_io
            self.grid = vxblx_io.load_vxblx(path, self.cfg)
        else:
            self.grid = serial_io.load_grid(path, self.cfg)

    # -- stats -------------------------------------------------------------

    @property
    def num_blocks(self) -> int:
        return int(self.grid.n_blocks)

    def stats(self) -> dict:
        self.join_mesh()    # mesh_cache readers see the landed cycle
        return {
            "frames": self._frames_integrated,
            "blocks": int(self.grid.n_blocks),
            "overflow": int(self.grid.overflow),
            "dropped_rays": int(self.grid.dropped_rays),
            # allocated rows only: the trash tile holds garbage by contract
            # on the Pallas RMW path (uninitialized buffers)
            "observed_voxels": int(np.asarray(
                (self.grid.wsum[:int(self.grid.n_blocks)] > 0).sum())),
        }
