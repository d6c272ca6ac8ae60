"""Cross-PROCESS pinning of the sinks/locks.py contract (r13 verdict
task 5): the reentrancy/heartbeat/stale-break tests in
test_maintenance.py are same-process threads, but the advisory-file
semantics — O_EXCL exclusion, stale-break of a dead holder, token-
verified release — are precisely the cross-process claims.  These tests
run a REAL second interpreter.

The "dead holder never unlinks the reclaimed lock" claim is pinned via
the strictly stronger case: a holder that is ALIVE but whose lock was
broken (a kill -9'd process executes nothing, so the only way its
release path can run is if it wasn't actually dead — SIGSTOP'd past
stale_s, or a clock-skewed breaker).  Its `_release_owned` must see the
token mismatch and leave the new holder's lock file alone.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_HOLDER = """\
import os, sys, time
sys.path.insert(0, {repo!r})
from localsql_spark.sinks.locks import store_lock
store, release_signal = sys.argv[1], sys.argv[2]
with store_lock(store):
    print("HELD", flush=True)
    while not os.path.exists(release_signal):
        time.sleep(0.05)
print("RELEASED", flush=True)
"""


def _spawn_holder(tmp_path: Path, store: Path) -> tuple:
    script = tmp_path / "holder.py"
    script.write_text(_HOLDER.format(repo=str(REPO)))
    signal = tmp_path / "release.signal"
    proc = subprocess.Popen(
        [sys.executable, str(script), str(store), str(signal)],
        stdout=subprocess.PIPE, text=True)
    line = proc.stdout.readline().strip()
    assert line == "HELD", line
    return proc, signal


def test_second_process_busy_then_reclaims_after_kill9(tmp_path):
    """While a real second process holds the lock, acquisition raises
    MaintenanceBusy; after kill -9 of the holder and stale_s elapsing
    (simulated by backdating the lock's mtime — staleness IS mtime age,
    and the dead holder's heartbeat no longer refreshes it), the lock is
    broken and re-acquired."""
    from localsql_spark.sinks.locks import (MaintenanceBusy, lock_path_for,
                                            store_lock)

    store = tmp_path / "store"
    store.mkdir()
    proc, _signal = _spawn_holder(tmp_path, store)
    try:
        with pytest.raises(MaintenanceBusy):
            with store_lock(str(store)):
                pass
    finally:
        proc.kill()  # SIGKILL: the holder's release path never runs
        proc.wait()
    lock = lock_path_for(str(store))
    assert lock.exists()  # the orphaned lock file
    # not yet stale: still Busy even though the holder is dead
    with pytest.raises(MaintenanceBusy):
        with store_lock(str(store)):
            pass
    past = time.time() - 7200
    os.utime(lock, (past, past))
    with store_lock(str(store)):  # stale-break + reclaim
        assert lock.exists()
    assert not lock.exists()  # normal ownership-verified release


def test_broken_holders_release_never_unlinks_new_lock(tmp_path):
    """A holder whose lock was stale-broken (here: mtime backdated while
    it was alive, the SIGSTOP/clock-skew scenario) runs its release path
    after a NEW holder acquired — the token mismatch must leave the new
    holder's lock file untouched, and a third acquisition must still see
    Busy while the new holder holds."""
    from localsql_spark.sinks.locks import (MaintenanceBusy, lock_path_for,
                                            store_lock)

    store = tmp_path / "store"
    store.mkdir()
    proc, signal = _spawn_holder(tmp_path, store)
    lock = lock_path_for(str(store))
    past = time.time() - 7200
    os.utime(lock, (past, past))
    try:
        with store_lock(str(store)):  # breaks the "stale" lock, reclaims
            my_token = lock.read_text()
            signal.touch()  # let the ghost run its release path
            assert proc.stdout.readline().strip() == "RELEASED"
            proc.wait(timeout=30)
            # the ghost's _release_owned saw a foreign token: no unlink
            assert lock.exists() and lock.read_text() == my_token
            with pytest.raises(MaintenanceBusy):
                with _other_thread_acquire(str(store)):
                    pass
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert not lock.exists()


class _other_thread_acquire:
    """Acquire the store lock from a separate thread (same-thread entry
    would be reentrant), re-raising its MaintenanceBusy in the caller."""

    def __init__(self, store: str):
        self.store = store

    def __enter__(self):
        import threading

        from localsql_spark.sinks.locks import store_lock

        exc: list[BaseException] = []

        def run():
            try:
                with store_lock(self.store):
                    pass
                exc.append(None)
            except BaseException as e:  # noqa: BLE001
                exc.append(e)

        t = threading.Thread(target=run)
        t.start()
        t.join()
        if isinstance(exc[0], BaseException):
            raise exc[0]
        return self

    def __exit__(self, *a):
        return False
