"""The advisory TPU lock (utils/tpu_lock.py) serializes independently
launched TPU processes (sweep legs vs bench.py) on the single-chip host.
CLAUDE.md: two concurrent TPU processes wedge the tunneled backend."""

import os
import subprocess
import sys
import textwrap

from resolution_pde_tpu.utils.tpu_lock import _cpu_pinned, tpu_lock

CHILD = textwrap.dedent("""
    import os, sys, time
    sys.path.insert(0, {repo!r})
    from resolution_pde_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock("test-child"):
        with open(sys.argv[1], "a") as f:
            f.write(f"enter {{os.getpid()}}\\n")
        time.sleep(0.3)
        with open(sys.argv[1], "a") as f:
            f.write(f"exit {{os.getpid()}}\\n")
""").format(repo="/root/repo")


def test_tpu_lock_serializes_processes(tmp_path):
    log = str(tmp_path / "order.log")
    env = dict(os.environ,
               RPDE_TPU_LOCK=str(tmp_path / "lock"),
               JAX_PLATFORMS="tpu")  # NOT cpu: the lock must engage
    procs = [subprocess.Popen([sys.executable, "-c", CHILD, log], env=env)
             for _ in range(3)]
    for p in procs:
        assert p.wait(timeout=60) == 0
    lines = open(log).read().splitlines()
    assert len(lines) == 6
    # critical sections never interleave: every enter is immediately
    # followed by the same pid's exit
    for i in range(0, 6, 2):
        ev_a, pid_a = lines[i].split()
        ev_b, pid_b = lines[i + 1].split()
        assert (ev_a, ev_b) == ("enter", "exit")
        assert pid_a == pid_b


def test_tpu_lock_noop_when_cpu_pinned():
    # the test process is CPU-pinned by conftest -> the lock must be a
    # no-op (a CPU test must never queue behind a long TPU leg), which
    # also makes it safely nestable here
    assert _cpu_pinned()
    with tpu_lock("outer"):
        with tpu_lock("inner"):
            pass


def test_tpu_lock_timeout(tmp_path):
    import time

    import pytest

    import resolution_pde_tpu.utils.tpu_lock as tl

    lock_path = str(tmp_path / "lock")
    env = dict(os.environ, RPDE_TPU_LOCK=lock_path, JAX_PLATFORMS="tpu")
    holder = textwrap.dedent("""
        import sys, time
        sys.path.insert(0, "/root/repo")
        from resolution_pde_tpu.utils.tpu_lock import tpu_lock
        with tpu_lock("holder"):
            print("held", flush=True)
            time.sleep(5)
    """)
    p = subprocess.Popen([sys.executable, "-c", holder], env=env,
                         stdout=subprocess.PIPE, text=True)
    try:
        assert p.stdout.readline().strip() == "held"
        orig_path, orig_pin = tl.LOCK_PATH, tl._cpu_pinned
        tl.LOCK_PATH, tl._cpu_pinned = lock_path, lambda: False
        try:
            t0 = time.monotonic()
            with pytest.raises(TimeoutError):
                with tl.tpu_lock("waiter", timeout_s=0.5, poll_s=0.1):
                    pass
            assert time.monotonic() - t0 < 4
            # a sub-poll timeout raises near timeout_s, not at poll_s
            t0 = time.monotonic()
            with pytest.raises(TimeoutError):
                with tl.tpu_lock("waiter2", timeout_s=0.3, poll_s=30.0):
                    pass
            assert time.monotonic() - t0 < 2
            # the timed-out waiter never held the lock, so it must NOT
            # have erased the live holder's tag
            tag = open(lock_path).read().strip()
            assert tag.endswith("holder"), tag
        finally:
            tl.LOCK_PATH, tl._cpu_pinned = orig_path, orig_pin
    finally:
        p.kill()
        p.wait()


def test_tpu_lock_detects_ancestor_holder(tmp_path):
    """A CLI that takes the lock itself, wrapped in an outer `flock`
    (an ancestor holding the lock), must fail loudly instead of
    deadlocking forever (the ancestor cannot release until we exit)."""
    import subprocess
    import sys as _sys
    import textwrap

    lock_path = str(tmp_path / "lock")
    child = textwrap.dedent(f"""
        import os, sys
        os.environ.pop("JAX_PLATFORMS", None)
        sys.path.insert(0, {repr(os.getcwd())})
        import resolution_pde_tpu.utils.tpu_lock as tl
        tl.LOCK_PATH = {repr(lock_path)}
        tl._cpu_pinned = lambda: False
        try:
            with tl.tpu_lock("inner", timeout_s=30, poll_s=0.1):
                pass
        except RuntimeError as e:
            assert "ancestor" in str(e), e
            print("ANCESTOR_DETECTED")
            sys.exit(0)
        print("NO_DETECTION")
        sys.exit(1)
    """)
    out = subprocess.run(
        ["flock", lock_path, sys.executable, "-c", child],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": os.getcwd()})
    assert "ANCESTOR_DETECTED" in out.stdout, (out.stdout, out.stderr)


def test_tpu_lock_open_but_unlocked_ancestor_not_flagged(tmp_path):
    """An ancestor that merely has the lock FILE open (without holding
    the flock) must not trigger the deadlock error — only the kernel's
    lock table identifies a true holder."""
    import subprocess
    import textwrap

    lock_path = str(tmp_path / "lock")
    open(lock_path, "w").close()
    child = textwrap.dedent(f"""
        import os, sys
        sys.path.insert(0, {repr(os.getcwd())})
        import resolution_pde_tpu.utils.tpu_lock as tl
        tl.LOCK_PATH = {repr(lock_path)}
        tl._cpu_pinned = lambda: False
        # lock is FREE (parent only holds an open fd): acquisition
        # succeeds immediately, no ancestor error
        with tl.tpu_lock("inner", timeout_s=5, poll_s=0.1):
            print("ACQUIRED_OK")
    """)
    script = tmp_path / "child.py"
    script.write_text(child)
    # parent shell keeps fd 9 open on the lock file WITHOUT flock-ing it
    out = subprocess.run(
        ["bash", "-c", f"exec 9>{lock_path}; {sys.executable} {script}"],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": os.getcwd()})
    assert "ACQUIRED_OK" in out.stdout, (out.stdout, out.stderr)
