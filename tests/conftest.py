"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised with
``--xla_force_host_platform_device_count=8`` exactly as the driver's
dryrun does; real-TPU execution is covered by bench.py.

This environment ships an `axon` JAX plugin (sitecustomize on PYTHONPATH)
that, when ``JAX_PLATFORMS=axon`` is set at interpreter start, tunnels XLA
compilation to a remote TPU terminal — making every CPU test compile take
10-40 s. The platform choice is baked in when jax is first imported (which
the sitecustomize does), so it cannot be fixed in-process: pytest_configure
re-execs pytest once with ``JAX_PLATFORMS=cpu`` set from the start.
"""

import os
import sys


def _needs_reexec() -> bool:
    if os.environ.get("DEEPOF_TPU_TEST_REEXEC") == "1":
        return False
    axon_on_path = any(
        ".axon_site" in p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )
    return axon_on_path or os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")


def pytest_configure(config):
    if not _needs_reexec():
        return
    env = dict(os.environ)
    env["DEEPOF_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # Parity tests check numerics against float64 pandas/scipy oracles.
    env["JAX_ENABLE_X64"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    if repo_root not in pythonpath:
        pythonpath.insert(0, repo_root)
    env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    env.pop("PALLAS_AXON_POOL_IPS", None)

    # Restore the real stdout/stderr fds before exec, or the child's output
    # lands in this process's (about-to-die) capture temp files.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + list(config.invocation_params.args),
        env,
    )


os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
