"""Multi-host (DCN-analog) coverage: the camera-sharded step over a mesh
that SPANS TWO PROCESSES (VERDICT r1 #10; SURVEY §2.3 4-camera stretch).

On real hardware this is a multi-host TPU slice where the fusion
`all_gather` rides DCN between hosts. Here it is two `jax.distributed` CPU
processes with 2 virtual devices each — the standard JAX recipe for
validating cross-process collectives without hardware. The reference has no
distributed mode at all (single process, single GPU — SURVEY §2.3), so the
semantics under test are rt3d's own: sharded-step outputs must match the
single-process step bit-for-bit on the valid slots.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
DEVS_PER_PROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, attempt):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVS_PER_PROC}"
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["PYTHONPATH"] = ":".join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and "axon_site" not in p]
    )
    # each process compiles the same tiny programs; share the test cache
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rt3d_jax_cache_cpu")

    procs = []
    outs = []
    for pid in range(NPROC):
        out_json = str(tmp_path / f"worker{pid}_a{attempt}.json")
        outs.append(out_json)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), str(NPROC), str(port), out_json],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = [p.communicate(timeout=600)[0].decode(errors="replace")
            for p in procs]
    return procs, logs, outs


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    # Gloo's rendezvous KV-get has a hard 30 s timeout; on this 1-core box
    # the two workers can skew past it when one hits a cold compile. That
    # is infra timing, not collective semantics — retry once (the first
    # attempt also warms the shared compile cache, so the rerun is fast
    # and tightly synchronized).
    for attempt in range(2):
        procs, logs, outs = _run_workers(tmp_path, attempt)
        if all(p.returncode == 0 for p in procs):
            break
        gloo_skew = any("Gloo context initialization failed" in log
                        or "DEADLINE_EXCEEDED" in log for log in logs)
        if attempt == 1 or not gloo_skew:
            for pid, (p, log) in enumerate(zip(procs, logs)):
                assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"

    summaries = []
    for out_json in outs:
        with open(out_json) as f:
            summaries.append(json.load(f))
    for s in summaries:
        assert s["devices_global"] == NPROC * DEVS_PER_PROC
        assert s["devices_local"] == DEVS_PER_PROC
        assert s["match_single_process"], s
    # both processes saw the SAME replicated fused outputs
    assert summaries[0]["fused_points"] == summaries[1]["fused_points"]
    assert summaries[0]["workspace_count"] == summaries[1]["workspace_count"]
    assert summaries[0]["fused_sum"] == pytest.approx(
        summaries[1]["fused_sum"], rel=1e-6)
