"""Advisory inter-process lock serializing TPU access on this host.

The attached backend exposes ONE chip through a tunnel, and two concurrent
TPU processes wedge each other (see CLAUDE.md). Long-running TPU drivers
(sweep legs, data generation) and the benchmark can overlap in wall time
when launched independently; an `fcntl.flock` on a well-known path
serializes them. The lock is advisory: processes that never take it (the
CPU test suite, host-only tools) are unaffected. Lock scope is kept as
narrow as the caller can manage — the sweep runner takes it per LEG, not
per family, so a waiter is unblocked at the next leg boundary.

The flock is tied to the file handle's lifetime, so a killed holder
releases it immediately (no stale-lockfile problem).
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import time

LOCK_PATH = os.environ.get("RPDE_TPU_LOCK", "/tmp/rpde_tpu.lock")


def _cpu_pinned() -> bool:
    """True when this process targets the CPU backend (tests, CPU tools) —
    no chip contention is possible, so the lock is skipped: a CPU run must
    never queue behind a multi-minute TPU leg."""
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        try:
            plats = jax_mod.config.jax_platforms or ""
            return plats.split(",")[0] == "cpu"
        except Exception:  # pragma: no cover
            pass
    return os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu"


def _flock_holder_pids() -> set[int]:
    """PIDs /proc/locks reports as holding a FLOCK on LOCK_PATH's inode.

    Merely having the file OPEN is not holding the lock (a wrapper that
    tried `flock -n` and continued, or a tag reader), so the ancestor
    check below must consult the kernel's lock table, not fd listings.
    Empty set when /proc/locks can't be read or parsed (non-Linux)."""
    pids: set[int] = set()
    try:
        st = os.stat(LOCK_PATH)
        want = f"{os.major(st.st_dev):02x}:{os.minor(st.st_dev):02x}:" \
               f"{st.st_ino}"
        with open("/proc/locks") as f:
            for ln in f:
                parts = ln.split()
                # "1: FLOCK ADVISORY WRITE <pid> <maj:min:inode> ..."
                if len(parts) >= 6 and parts[1] == "FLOCK" \
                        and parts[5] == want:
                    pids.add(int(parts[4]))
    except Exception:  # pragma: no cover - diagnostics must never crash
        return set()
    return pids


def _ancestor_with_lock_open() -> int | None:
    """PID of an ancestor process that HOLDS the flock on LOCK_PATH,
    else None.

    If an ancestor holds it (e.g. the caller wrapped a CLI that takes
    the lock itself in `flock /tmp/rpde_tpu.lock ...`), waiting can
    NEVER succeed — the ancestor won't release until we exit. Detecting
    this turns a silent forever-hang into an immediate, explained error.
    Linux-only (/proc); returns None anywhere it can't tell."""
    holders = _flock_holder_pids()
    if not holders:
        return None
    try:
        pid = os.getppid()
        for _ in range(32):  # bounded ancestor walk
            if pid <= 1:
                return None
            if pid in holders:
                return pid
            with open(f"/proc/{pid}/status") as st:
                ppid = next((int(ln.split()[1]) for ln in st
                             if ln.startswith("PPid:")), None)
            if ppid is None:
                return None
            pid = ppid
    except Exception:  # pragma: no cover - diagnostics must never crash
        return None
    return None


@contextlib.contextmanager
def tpu_lock(what: str = "tpu", timeout_s: float | None = None,
             poll_s: float = 5.0):
    """Hold the host-wide TPU lock for the duration of the context.

    Blocks (polling, so a waiting message can be emitted) until the lock
    is free. `timeout_s=None` waits forever — a benchmark queued behind a
    training leg should run late rather than crash both processes.
    No-op when the process is pinned to CPU. NOT reentrant (flock on a
    second fd in one process blocks): take it at the outermost driver
    layer only.
    """
    if _cpu_pinned():
        yield
        return
    f = open(LOCK_PATH, "a+")
    acquired = False
    try:
        t0 = time.monotonic()
        deadline = None if timeout_s is None else t0 + timeout_s
        warned = False
        while True:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                acquired = True
                break
            except OSError:
                now = time.monotonic()
                if deadline is not None and now >= deadline:
                    raise TimeoutError(
                        f"TPU lock {LOCK_PATH} still held after "
                        f"{now - t0:.0f}s (wanted for: {what})")
                if not warned:
                    anc = _ancestor_with_lock_open()
                    if anc is not None:
                        raise RuntimeError(
                            f"TPU lock {LOCK_PATH} is held by ancestor "
                            f"process {anc} (e.g. an outer `flock` wrapper "
                            f"around a CLI that takes the lock itself) — "
                            f"waiting would deadlock. Drop the wrapper: "
                            f"bench.py, cli.sweep and cli.generate_data "
                            f"serialize themselves (wanted for: {what}).")
                    try:
                        f.seek(0)
                        holder = f.read(256).strip()
                    except OSError:  # pragma: no cover
                        holder = "?"
                    print(f"[tpu_lock] waiting for {LOCK_PATH} "
                          f"(held by: {holder or '?'}; wanted for: {what})",
                          file=sys.stderr, flush=True)
                    warned = True
                if deadline is None:
                    # Block in the kernel: a sweep releases and re-takes
                    # the lock within milliseconds at a leg boundary, so a
                    # poll-every-5s waiter would starve for the whole
                    # family; a blocked flock waiter is woken on release
                    # and actually wins the handoff.
                    fcntl.flock(f, fcntl.LOCK_EX)
                    acquired = True
                    break
                # never oversleep the deadline (a sub-poll timeout must
                # raise at ~timeout_s, not at poll_s)
                time.sleep(min(poll_s, max(deadline - now, 0.01)))
        if warned:
            print(f"[tpu_lock] acquired after "
                  f"{time.monotonic() - t0:.0f}s ({what})",
                  file=sys.stderr, flush=True)
        try:  # best-effort holder tag for the waiting message
            f.seek(0)
            f.truncate()
            f.write(f"pid {os.getpid()}: {what}\n")
            f.flush()
        except OSError:  # pragma: no cover
            pass
        yield
    finally:
        if acquired:  # on the timeout path we never held the lock, and
            try:  # truncating would erase the LIVE holder's tag.
                f.seek(0)  # Clear the tag while still holding the lock,
                f.truncate()  # so waiters never report a released holder.
            except OSError:  # pragma: no cover
                pass
        f.close()  # closing the fd releases the flock
