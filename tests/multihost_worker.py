"""Worker process for the 2-host DCN-analog test (`tests/test_multihost.py`).

Each process owns 2 virtual CPU devices; a 4-camera `{'cam': 4}` mesh spans
both processes, so the fusion `all_gather` in
`rt3d.parallel.multicam.make_sharded_step` crosses the process boundary —
the CPU-mesh analog of a multi-host DCN collective on TPU (SURVEY §2.3's
4-camera stretch config; the reference itself is single-process,
single-GPU — `2cams_mask_gpu.py:272-291`).

Run as:  python tests/multihost_worker.py PID NPROC PORT OUT_JSON
"""

from __future__ import annotations

import json
import os
import sys
import time


def _fs_barrier(tag: str, pid: int, nproc: int, bdir: str,
                timeout: float = 540.0) -> None:
    """Filesystem barrier: on a 1-core box the two workers skew by the
    SERIALIZED interpreter startup + compile time, which blows Gloo's hard
    30 s rendezvous timeout if one process reaches the first collective
    early. Align them explicitly before executing any collective."""
    open(os.path.join(bdir, f"{tag}.{pid}"), "w").close()
    t0 = time.time()
    while not all(
        os.path.exists(os.path.join(bdir, f"{tag}.{q}"))
        for q in range(nproc)
    ):
        if time.time() - t0 > timeout:
            raise TimeoutError(f"barrier {tag}: peer never arrived")
        time.sleep(0.25)


def _globalize(tree, mesh, cam_axis, pid, per_proc):
    """Turn process-local pytree shards into global jax.Arrays.

    Leaves whose leading dim equals the total camera count are sharded over
    `cam_axis` (this process contributes rows [pid*per_proc, ...)); all
    other leaves are replicated (every process passes the full value).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    total = mesh.shape[cam_axis]
    cam_sh = NamedSharding(mesh, P(cam_axis))
    rep_sh = NamedSharding(mesh, P())
    lo = pid * per_proc

    def g(x):
        x = np.asarray(x)
        if x.ndim and x.shape[0] == total:
            return jax.make_array_from_process_local_data(
                cam_sh, x[lo : lo + per_proc]
            )
        return jax.make_array_from_process_local_data(rep_sh, x)

    return jax.tree_util.tree_map(g, tree)


def main() -> int:
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp  # noqa: F401  (keeps lowering deps local)

    from rt3d.io.synthetic import SyntheticSource
    from rt3d.parallel.mesh import make_mesh
    from rt3d.parallel.multicam import make_sharded_step
    from rt3d.pipeline.step import CameraCalib, build_pipeline
    from tests.tiny import H, W, tiny_config

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, nproc, n_local)
    cams = n_global  # one camera pipeline per device, spanning processes

    cfg = tiny_config(num_cameras=cams)
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=cams, num_frames=1, hw=(H, W))
    pkt = src.get(0)

    mesh = make_mesh({"cam": cams})
    sharded = make_sharded_step(pipe, mesh)

    per_proc = cams // nproc
    g_params = _globalize(params, mesh, "cam", pid, per_proc)
    g_state = _globalize(pipe.init_state(), mesh, "cam", pid, per_proc)
    g_rgb = _globalize(np.asarray(pkt.rgb), mesh, "cam", pid, per_proc)
    g_depth = _globalize(np.asarray(pkt.depth), mesh, "cam", pid, per_proc)
    g_calib = _globalize(calib, mesh, "cam", pid, per_proc)

    # compile ahead of time, then BARRIER, then execute: the first
    # execution initializes the Gloo context (hard 30 s rendezvous), so
    # both processes must reach it together
    bdir = os.path.dirname(os.path.abspath(out_path))
    # tag unique per test attempt (out files are worker{pid}_a{N}.json) so
    # a retry never sees the previous attempt's barrier files
    tag = "compiled_a" + os.path.basename(out_path).rsplit("_a", 1)[-1]
    compiled = sharded.lower(
        g_params, g_state, g_rgb, g_depth, g_calib
    ).compile()
    _fs_barrier(tag, pid, nproc, bdir)
    _, out = compiled(g_params, g_state, g_rgb, g_depth, g_calib)

    # fused outputs are replicated -> every process holds a full copy
    flat_pts = np.asarray(out.objects_flat.points)
    flat_valid = np.asarray(out.objects_flat.valid)
    ws_count = int(np.asarray(out.workspace.count))

    # single-process reference on one local device (no collectives)
    ref_state, ref_out = jax.jit(pipe.step)(
        params, pipe.init_state(), np.asarray(pkt.rgb),
        np.asarray(pkt.depth), calib,
    )
    ref_pts = np.asarray(ref_out.objects_flat.points)
    ref_valid = np.asarray(ref_out.objects_flat.valid)
    ref_ws = int(np.asarray(ref_out.workspace.count))

    match = (
        bool((flat_valid == ref_valid).all())
        and bool(np.allclose(flat_pts[flat_valid], ref_pts[ref_valid],
                             atol=1e-5))
        and ws_count == ref_ws
    )
    summary = {
        "pid": pid,
        "devices_global": n_global,
        "devices_local": n_local,
        "match_single_process": match,
        "fused_points": int(flat_valid.sum()),
        "workspace_count": ws_count,
        "fused_sum": float(np.abs(flat_pts[flat_valid]).sum()),
    }
    with open(out_path, "w") as f:
        json.dump(summary, f)
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())
