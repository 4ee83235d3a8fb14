"""Test configuration: force a REAL 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual CPU mesh (the standard JAX recipe).

Subtlety: this environment's sitecustomize (PYTHONPATH=/root/.axon_site)
registers the TPU tunnel plugin at interpreter start — before any conftest
runs — and pins the backend, so setting JAX_PLATFORMS here is too late.
The only reliable fix is to re-exec pytest once with a scrubbed
environment; the re-exec is guarded by RT3D_TEST_REEXEC.
"""

import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and not os.environ.get("RT3D_TEST_REEXEC")
):
    env = dict(os.environ)
    env["RT3D_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # drop the axon site dir but keep everything else on PYTHONPATH
    pp = [p for p in env.get("PYTHONPATH", "").split(":")
          if p and "axon_site" not in p]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in pp:
        pp.insert(0, repo_root)
    env["PYTHONPATH"] = ":".join(pp)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # NOTE: cannot execve here — pytest's fd-level capture has already
    # swapped fd 1, so the replacement process would write into a capture
    # tempfile that is then discarded. Run a child, tee its output to a log
    # (and best-effort to our fds), and exit with its code.
    import subprocess

    cmd = [sys.executable, "-m", "pytest", *sys.argv[1:]]
    with open("/tmp/rt3d_pytest_inner.log", "wb") as logf:
        proc = subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT
        )
        for line in proc.stdout:
            logf.write(line)
            logf.flush()
            try:
                sys.stdout.write(line.decode(errors="replace"))
                sys.stdout.flush()
            except Exception:
                pass
        proc.wait()
    os._exit(proc.returncode)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Persistent compilation cache: this box has a single CPU core, so XLA
# compiles dominate test wall-time unless cached across runs.
# NOTE: a cache dir distinct from any TPU-tunnel runs — that relay AOT-
# compiles CPU programs for a different machine profile (SIGILL risk).
jax.config.update("jax_compilation_cache_dir", "/tmp/rt3d_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
