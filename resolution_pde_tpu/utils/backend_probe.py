"""Flap-tolerant device-backend probing (shared by bench.py and cli/sweep.py).

The tunneled-TPU backend can die mid-session, and two JAX behaviors make
naive handling fatal (observed live, RESULTS.md "tunnel-relay death"):

1. JAX caches a failed platform initialization for the process lifetime
   (xla_bridge records the error and never retries), so one transient
   outage poisons every later device touch in the same interpreter.
2. With the relay down, ``jax.devices()`` HANGS rather than failing.

So the probe runs in a time-bounded CHILD process, leaving the caller's
backend state untouched, and retries on a sleep loop until the relay
returns (only the outer harness can restore it — poll, don't spin).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def child_env() -> dict:
    """Child-process env with this package's root on PYTHONPATH (callers
    may have chdir'd away from the repo root; `python -c` only adds cwd)."""
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def pin_platform() -> str:
    """Code prefix pinning a child's jax platform from $RPDE_PLATFORM.

    The sitecustomize pins JAX_PLATFORMS=axon in every process; an
    in-process jax.config.update is the only working override (CLAUDE.md),
    so tests export RPDE_PLATFORM=cpu to keep child probes off the TPU."""
    plat = os.environ.get("RPDE_PLATFORM")
    if not plat:
        return ""
    return ("import jax\n"
            f"jax.config.update('jax_platforms', {plat!r})\n")


def wait_for_backend(tries: int = 6, sleep_s: float = 60.0,
                     probe_timeout_s: float = 300.0) -> None:
    """Block until a child process can initialize the jax backend.

    Raises RuntimeError with the last probe's stderr tail after `tries`
    bounded attempts."""
    last = ""
    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 pin_platform() + "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout_s,
                env=child_env())
        except subprocess.TimeoutExpired:
            last = "probe timed out (relay down? check ss -ltn :8082)"
        else:
            if r.returncode == 0:
                return
            last = r.stderr.decode(errors="replace").strip()[-200:]
        print(f"backend probe {i + 1}/{tries} failed ({last}); "
              f"retrying in {sleep_s:.0f}s", file=sys.stderr, flush=True)
        time.sleep(sleep_s)
    raise RuntimeError(f"device backend unavailable after {tries} probes: "
                       f"{last}")
