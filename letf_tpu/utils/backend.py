"""Backend selection resilient to a dead accelerator tunnel.

The environment force-registers the axon TPU plugin; when its tunnel is
unreachable, ``jax.devices()`` can HANG indefinitely (or raise
``Unable to initialize backend 'axon'``) instead of falling back,
killing every entry point at startup. ``ensure_backend()`` probes the
accelerator in a SUBPROCESS with a timeout and pins host CPU on
failure, so the orchestrator/CLI/bench/diagnostics degrade to CPU
instead of dying or hanging.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax

_PROBED: dict[str, bool] = {}
_PROBE_STAMP = "/tmp/letf_tpu_accel_probe_ok"
_PROBE_TTL_S = 600.0


def _accelerator_probe_ok(timeout: float) -> bool:
    """True if a fresh process can initialize the default JAX backend and
    list devices within ``timeout`` seconds. Run in a subprocess because
    a dead tunnel makes the in-process probe hang uninterruptibly. A
    success is stamped to /tmp with a 10-minute TTL so back-to-back
    entry points skip the ~30 s probe; failures are never cached (the
    tunnel may come back)."""
    if "ok" in _PROBED:
        return _PROBED["ok"]
    try:
        import time

        if time.time() - os.path.getmtime(_PROBE_STAMP) < _PROBE_TTL_S:
            _PROBED["ok"] = True
            return True
    except OSError:
        pass
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        _PROBED["ok"] = r.returncode == 0
    except subprocess.TimeoutExpired:
        _PROBED["ok"] = False
    if _PROBED["ok"]:
        try:
            with open(_PROBE_STAMP, "w"):
                pass
        except OSError:
            pass
    return _PROBED["ok"]


def _backends_initialized() -> bool:
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def ensure_backend(probe_timeout: float = 120.0) -> str:
    """Return the default platform, pinning CPU if the accelerator plugin
    is registered but unreachable or hanging. Also re-pins via config
    when the platform resolves to cpu (the env var alone is overridden
    by the plugin's re-registration — see CLAUDE.md)."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    if not _backends_initialized() and not _accelerator_probe_ok(probe_timeout):
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    return platform
