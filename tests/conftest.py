"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This container routes JAX at a remote TPU chip via the `axon` plugin, which
`sitecustomize` registers at interpreter startup (before conftest can run).
The plugin makes every XLA compile take ~1-8 s through a network relay even
on the CPU backend, and hangs ~90 s in process teardown. Tests must run on
the local CPU backend, so we re-exec pytest once with a scrubbed environment
(from pytest_configure, after restoring the real stdio fds).
"""

import os
import sys

_AXON_SITE = os.path.join(os.path.expanduser("~"), ".axon_site")


def _axon_loaded() -> bool:
    return any(_AXON_SITE in (p or "") for p in sys.path)


# Env setup (effective in both the first and the re-exec'd process; must run
# before any test module imports jax).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")


def pytest_configure(config):
    if os.environ.get("QGT_TEST_REEXEC") == "1" or not _axon_loaded():
        return
    env = dict(os.environ)
    env["QGT_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and _AXON_SITE not in p
    )
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


def pytest_sessionfinish(session, exitstatus):
    session.config._qgt_exit = int(exitstatus)


def pytest_unconfigure(config):
    # If the axon plugin did load anyway, skip its slow process teardown —
    # tests are done and reported by now.
    sys.stdout.flush()
    sys.stderr.flush()
    if _axon_loaded():
        os._exit(getattr(config, "_qgt_exit", 0))
