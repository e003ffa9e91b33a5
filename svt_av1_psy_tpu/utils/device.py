"""Device platform selection with liveness probing.

The TPU attaches through an experimental tunnel transport that can wedge:
compute dispatch keeps working while device->host transfers hang forever.
A hung encoder is worse than a slow one, so before committing the process
to the TPU backend we probe a round-trip transfer IN A SUBPROCESS with a
timeout, and fall back to the CPU backend when the probe fails.

This is the failure-detection analog of the reference's error-exit path
(ref: Source/Lib/Globals/enc_handle.c:6087 lib_svt_encoder_send_error_exit):
detect a wedged backend early and degrade, never deadlock.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SRC = (
    "import jax, numpy as np; x = jax.numpy.ones((16, 16)) + 1; "
    "a = np.asarray(x); assert a[0, 0] == 2; print('ok')"
)

_cached: str | None = None


def enable_jit_cache() -> None:
    """Enable jax's persistent compilation cache (idempotent).

    The decide/HME/GoP-search programs cost 20-90 s to compile through
    the tunnel backend; caching compiled executables on disk makes every
    process after the first start instantly (the PGO-build/warm-start
    analog of the reference's one-time RTCD dispatch init). Opt out with
    SVT_JIT_CACHE=0."""
    if os.environ.get("SVT_JIT_CACHE", "1") == "0":
        return
    import jax
    try:
        path = os.environ.get("SVT_JIT_CACHE_DIR",
                              os.path.expanduser("~/.cache/svt_jax_cache"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def probe_default_backend(timeout: float = 25.0, retries: int = 3,
                          backoff: float = 20.0) -> bool:
    """True if the default jax backend completes a host round-trip.

    The tunnel transport wedges transiently; retry with a backoff before
    giving up (a CPU-fallback bench run is a 2x worse number, so a
    minute of probing is worth it)."""
    import json
    import tempfile
    import time

    # probe-result cache: the subprocess round-trip costs 5-10 s; a probe
    # verdict from the last few minutes is as good as a fresh one (the
    # wedge this detects persists for hours when it happens)
    cache = os.path.join(tempfile.gettempdir(), "svt_tpu_probe.json")
    ttl = float(os.environ.get("SVT_TPU_PROBE_TTL", "600"))
    try:
        st = json.load(open(cache))
        if time.time() - st["ts"] < ttl:
            return bool(st["ok"])
    except (OSError, ValueError, KeyError):
        pass

    def record(ok: bool) -> bool:
        try:
            json.dump({"ts": time.time(), "ok": ok}, open(cache, "w"))
        except OSError:
            pass
        return ok

    for attempt in range(max(retries, 1)):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                               capture_output=True, timeout=timeout)
            if b"ok" in r.stdout:
                return record(True)
        except (subprocess.TimeoutExpired, OSError):
            pass
        if attempt + 1 < retries:
            time.sleep(backoff)
    return record(False)


def select_platform(preferred: str = "auto") -> str:
    """Pick the jax platform BEFORE any jax import in this process.

    preferred: 'auto' (probe TPU, fall back to cpu), 'cpu', or a platform
    name to force. Returns the chosen platform string. Must be called
    before jax backends initialize; safe to call again afterwards (cached).
    """
    global _cached
    if _cached is not None:
        return _cached
    if preferred != "auto":
        choice = preferred
    elif os.environ.get("SVT_TPU_PLATFORM"):
        choice = os.environ["SVT_TPU_PLATFORM"]
    else:
        choice = "default" if probe_default_backend() else "cpu"
    if choice in ("cpu",):
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    enable_jit_cache()
    _cached = choice
    return choice
