"""Smoke tests for bench.py's bounded device-wait guard.

The guard exists because axon backend init HANGS (rather than erroring)
while the dev-tunnel relay is down — an unguarded end-of-round bench run
would stall at the first `jax.devices()` and record nothing. These tests
run on CPU, where backend init succeeds instantly, and only exercise the
probe loop's control flow (success path + deadline bounding)."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_wait_for_device_succeeds_on_healthy_backend():
    # CPU jax init succeeds -> first probe returns True well inside budget
    assert bench._wait_for_device(120) is True


def test_wait_for_device_deadline_is_bounded(monkeypatch):
    # a probe that always hangs must not overrun the budget by more than
    # one probe floor (10 s)
    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    # bench imports subprocess inside the function; patching the module
    # global reaches the same object
    monkeypatch.setattr(subprocess, "run", hang)
    t0 = time.time()
    assert bench._wait_for_device(3) is False
    assert time.time() - t0 < 15
