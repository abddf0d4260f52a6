"""The driver-facing entry points must be hang-proof and fail-fast.

Round-2 post-mortem: with the axon TPU relay dead, `jax.devices()` (and any
backend init) retries the dead port forever. `MULTICHIP_r02.json` went
rc=124 because `__graft_entry__.dryrun_multichip` probed jax before its CPU
re-exec guard; `BENCH_r02.json` went rc=1 with a 30-line traceback. These
tests pin the fixes: dryrun re-execs into a scrubbed CPU subprocess
unconditionally, and both entry() and bench.py diagnose a dead relay in
bounded time with one actionable line.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _closed_port():
    """A TCP port that is guaranteed closed right now."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_dryrun_multichip_survives_dead_tpu_env():
    """Driver-shaped invocation: ambient env configured for the axon relay
    (which may be dead). The dryrun must complete on virtual CPU devices
    regardless — it re-execs before any jax call."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    env["PYTHONPATH"] = REPO
    env.pop("QGT_DRYRUN_CHILD", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        cwd=REPO, env=env, timeout=300, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "dryrun_multichip(4)" in out.stdout and "ok" in out.stdout


def test_relay_probe_diagnoses_closed_port(monkeypatch):
    import __graft_entry__ as g

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("QGT_RELAY_PORT", str(_closed_port()))
    reason = g._relay_dead_reason()
    assert reason is not None and "relay is dead" in reason

    # non-axon backends are never probed
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert g._relay_dead_reason() is None


def test_entry_falls_back_to_cpu_when_relay_dead():
    """entry() with a dead axon relay must not raise or hang: it flips the
    process to JAX_PLATFORMS=cpu (before backend init) and the returned
    step still compiles and runs."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = REPO
    # deterministically-dead relay: never touches a live TPU (one-client
    # rule) and exercises the fallback on every run
    env["QGT_RELAY_PORT"] = str(_closed_port())
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax, __graft_entry__ as g; fn, args = g.entry(); "
         "out = jax.jit(fn)(*args); jax.block_until_ready(out); "
         "print('entry-ok', out[0].shape)"],
        cwd=REPO, env=env, timeout=420, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "entry-ok" in out.stdout
    assert "falling back to JAX_PLATFORMS=cpu" in out.stderr


def test_scrubbed_cpu_env_drops_axon_plugin():
    import __graft_entry__ as g

    base = {
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "JAX_PLATFORMS": "axon",
        "PYTHONPATH": "/root/.axon_site",
        "XLA_FLAGS": "--xla_foo --xla_force_host_platform_device_count=2",
    }
    saved = {k: os.environ.get(k) for k in base}
    os.environ.update(base)
    try:
        env = g._scrubbed_cpu_env(8)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "axon" not in env["PYTHONPATH"]
    assert env["PYTHONPATH"].startswith(REPO)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--xla_foo" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]


def test_bench_fails_fast_when_relay_dead():
    """bench.py with a dead axon relay: exits 1 within seconds with one
    actionable line — no traceback, no hang."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = REPO
    env["QGT_RELAY_PORT"] = str(_closed_port())
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, env=env, timeout=60, capture_output=True, text=True,
    )
    assert out.returncode == 1
    assert "relay is dead" in out.stderr
    assert "Traceback" not in out.stderr


def test_bench_import_with_dead_relay_raises_catchable():
    """Importing bench (e.g. for HEAVY_HEX_27) with a dead relay must raise
    a RuntimeError the caller can catch — not SystemExit the process."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["PYTHONPATH"] = REPO
    env["QGT_RELAY_PORT"] = str(_closed_port())
    out = subprocess.run(
        [sys.executable, "-c",
         "try:\n"
         "    import bench\n"
         "except RuntimeError as e:\n"
         "    print('caught:', e)\n"],
        cwd=REPO, env=env, timeout=60, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "caught:" in out.stdout and "relay is dead" in out.stdout
