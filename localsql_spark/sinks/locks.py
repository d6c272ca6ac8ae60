"""Advisory single-writer locks for store maintenance — the signature
store's rename-claimed lock discipline (operators/dedup.py:_index_lock,
reviewed through two TOCTOU rounds), generalized so the COMPOSED passes
can enforce the farm-wide single-writer contract instead of documenting
it (verdict r12 task 3: "must not run concurrently" becomes "cannot").

Mechanics (all POSIX-atomic on local filesystems; object stores need a
real lock service, the documented limitation):

- Acquisition is an ``O_CREAT|O_EXCL`` create of ``.<name>.maint.lock``
  next to the store.  Live contention raises :class:`MaintenanceBusy`
  immediately — callers are maintenance jobs with a scheduler, not
  latency-sensitive readers, so fail-fast beats blocking.
- A lock older than ``stale_s`` is presumed abandoned by a crashed
  holder and broken via the serialized, re-verified ``.break`` protocol
  (claim the breaker mutex by O_EXCL create, re-verify staleness UNDER
  it, then unlink — the exact dance that closed the r9/r10 TOCTOUs in
  the index lock: two breakers can never unlink each other's fresh
  lock).
- Locks are PER-PROCESS REENTRANT with a refcount: the composed passes
  (``maintain_everywhere``, ``erase_everywhere``) take every configured
  store's lock up front and then call the per-store fold entry points,
  which take the same lock — reentrancy is what lets the entry points
  be individually safe without deadlocking the pass that composes them.
  Cross-process exclusion is unaffected (the file exists either way).
- Multi-store acquisition (:func:`farm_locks`) sorts paths before
  acquiring, so two passes over overlapping farms always contend on the
  first shared store instead of deadlocking, and rolls back everything
  it took when any acquisition fails.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from pathlib import Path

__all__ = ["MaintenanceBusy", "store_lock", "farm_locks", "lock_path_for",
           "configured_store_paths", "delegated_locks"]

# the store-map vocabulary shared by maintain_everywhere and
# erase_everywhere: config name -> the key holding the store's path.
# One table so the two passes can never disagree about which path a
# config locks.
_STORE_PATH_KEYS = {
    "primary": "base_dir", "inverted_index": "index_dir",
    "signature_store": "store_path", "ivfpq_index": "index_path",
    "ivf_index": "index_path", "scd2": "store_dir",
    "rollup": "rollup_dir", "ivm_view": "view_dir",
    "cov_store": "store_dir", "feed": "feed_dir",
    "ledger": "ledger_dir", "nb_model": "model_dir",
    "sketch_view": "view_dir",
}


def configured_store_paths(cfgs: dict) -> list[str]:
    """The store paths a composed pass over ``cfgs`` (config name ->
    config dict or None) will touch — the lock set for
    :func:`farm_locks`."""
    return [cfg[_STORE_PATH_KEYS[name]] for name, cfg in cfgs.items()
            if cfg is not None and name in _STORE_PATH_KEYS]


class MaintenanceBusy(OSError):
    """Another process holds a maintenance lock this operation needs.
    Retry later (or let the scheduler's next run pick the work up);
    never fall through to an unlocked rewrite."""


_STALE_S = 3600.0

# reentrancy is per (thread, lock path) — NOT per process: the composed
# passes hold every configured store's lock while calling fold entry
# points that re-acquire the same lock ON THE SAME CALL STACK, but a
# sibling thread in the same driver (a Structured Streaming foreachBatch
# callback, a user scheduler) is a genuinely concurrent writer and must
# get MaintenanceBusy, not a free reentrant pass (review round 13).
_HELD: dict[tuple[int, str], int] = {}
_HELD_MU = threading.Lock()


def lock_path_for(store_dir: str, name: str = "maint") -> Path:
    """The canonical lock file for a store: sibling dotfile, same
    convention as the staging dir and commit manifest — so hardlink-farm
    copies and store moves carry no stale lock inside the store.

    The PARENT is resolved via ``os.path.realpath`` so a symlinked
    parent, a relative vs absolute spelling, or a ``..``-spelled path
    all key the SAME lock file (advice r13: raw-string keying silently
    voided cross-process exclusion across spellings).  The final
    component is intentionally NOT resolved: the generation-swap design
    (:mod:`.generations`) makes the store path itself a symlink flipped
    atomically between generation dirs — resolving it would key the
    lock per-generation and void exclusion across a swap."""
    raw = Path(str(store_dir).rstrip("/"))
    parent = Path(os.path.realpath(raw.parent))
    return parent / f".{raw.name}.{name}.lock"


def _break_stale(lock: Path, stale_s: float) -> None:
    """Serialized stale-lock break (the dedup._break_stale_lock
    discipline): claim the ``.break`` mutex by O_EXCL create, re-verify
    the lock is STILL stale under it, then unlink.  An abandoned
    ``.break`` older than the threshold is claimed by rename (atomic,
    single winner) before the create."""
    brk = lock.with_name(lock.name + ".break")
    try:
        if time.time() - brk.stat().st_mtime > stale_s:
            claimed = brk.with_name(f"{brk.name}.claimed.{os.getpid()}")
            os.rename(brk, claimed)
            claimed.unlink(missing_ok=True)
    except OSError:
        pass
    try:
        bfd = os.open(brk, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return  # another breaker is mid-break; the create path decides
    try:
        try:
            if time.time() - lock.stat().st_mtime > stale_s:
                lock.unlink(missing_ok=True)
        except OSError:
            pass
    finally:
        os.close(bfd)
        brk.unlink(missing_ok=True)


# live locks held by THIS process: lock path -> the unique token written
# into the file at acquisition.  The heartbeat thread refreshes their
# mtimes so a legitimately long pass (> stale_s) is never broken as
# stale by a second scheduler, and release verifies the token so a
# holder whose lock WAS broken (crash recovery on a truly dead pid, or
# a clock-skewed breaker) can never unlink the NEW holder's lock — the
# two halves of the ownership contract (review round 13: an
# unconditional unlink after a stale break admitted a third writer).
_LIVE: dict[str, str] = {}
_HEARTBEAT_S = 60.0
_HB_STARTED = False


def _heartbeat() -> None:
    while True:
        time.sleep(_HEARTBEAT_S)
        with _HELD_MU:
            paths = list(_LIVE)
        for p in paths:
            try:
                os.utime(p)
            except OSError:
                pass  # released (or broken) since the snapshot


def _ensure_heartbeat() -> None:
    global _HB_STARTED
    with _HELD_MU:
        if _HB_STARTED:
            return
        _HB_STARTED = True
    threading.Thread(target=_heartbeat, name="store-lock-heartbeat",
                     daemon=True).start()


def _release_owned(lock: Path, token: str) -> None:
    """Unlink the lock ONLY if this process still owns it (the token we
    wrote is still in the file).  A mismatch means a breaker decided we
    were dead and a new holder acquired — leaving their file alone is
    the correct, quiet outcome (our own work may have interleaved with
    theirs, which the stale threshold + heartbeat make a
    clock-skew-grade anomaly, but unlinking would cascade it to a THIRD
    concurrent writer)."""
    try:
        if lock.read_text() == token:
            lock.unlink(missing_ok=True)
    except OSError:
        pass


@contextlib.contextmanager
def store_lock(store_dir: str, name: str = "maint",
               stale_s: float = _STALE_S):
    """Hold the store's advisory maintenance lock for the with-block.
    Reentrant within the process; raises :class:`MaintenanceBusy` on
    live cross-process contention; breaks a stale lock once before
    giving up.  Held locks are heartbeat-refreshed (mtime touch every
    ``_HEARTBEAT_S``) so staleness measures HOLDER DEATH, not pass
    duration; release is ownership-verified (see :func:`_release_owned`)."""
    lock = lock_path_for(store_dir, name)
    key = (threading.get_ident(), str(lock))
    with _HELD_MU:
        if _HELD.get(key, 0) > 0:  # reentrant re-acquire
            _HELD[key] += 1
            reentered = True
        else:
            reentered = False
    if reentered:
        try:
            yield
        finally:
            with _HELD_MU:
                _HELD[key] -= 1
        return
    lock.parent.mkdir(parents=True, exist_ok=True)
    for attempt in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - lock.stat().st_mtime
            except OSError:
                continue  # holder just released; retry the create
            if attempt == 0 and age > stale_s:
                _break_stale(lock, stale_s)
                continue
            raise MaintenanceBusy(
                f"maintenance lock held on {store_dir!r}: {lock}")
    else:
        raise MaintenanceBusy(
            f"maintenance lock held on {store_dir!r}: {lock}")
    token = f"pid={os.getpid()} token={os.urandom(8).hex()}\n"
    try:
        # a failed token write must not leave an ownerless lock file
        # behind (release would refuse the token mismatch and lock the
        # store out for stale_s with no live holder — advice r13): close
        # the fd and unlink the just-created lock before re-raising.
        try:
            try:
                os.write(fd, token.encode())
            finally:
                os.close(fd)
        except BaseException:
            lock.unlink(missing_ok=True)
            raise
        _ensure_heartbeat()
        with _HELD_MU:
            _HELD[key] = 1
            _LIVE[str(lock)] = token
        try:
            yield
        finally:
            with _HELD_MU:
                _HELD.pop(key, None)
                _LIVE.pop(str(lock), None)
    finally:
        _release_owned(lock, token)


def locked_by(param: str):
    """Decorator: hold the maintenance lock of the store named by
    parameter ``param`` for the call — the fold-entry-point form of
    :func:`store_lock` (reentrant under the composed passes, Busy for a
    genuinely concurrent writer).  Every fold that touches a store's
    shared staging dir wears this, so 'single-writer' is enforced at
    every entry point, not just the composed passes (review round
    13)."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            with store_lock(bound.arguments[param]):
                return fn(*args, **kwargs)
        return wrapper
    return deco


@contextlib.contextmanager
def delegated_locks(store_dirs, name: str = "maint"):
    """Enroll the CURRENT thread as a delegate of store locks ALREADY
    HELD by this process — the structured-concurrency counterpart of
    :func:`farm_locks`: a composed pass that holds the farm's locks may
    fan its independent per-store work out to worker threads (guide-
    style job overlap), and each worker wraps its store's work in this
    so the fold entry points' ``locked_by`` re-acquires take the
    reentrant path instead of raising :class:`MaintenanceBusy`.

    This does NOT weaken the per-(thread, path) reentrancy contract
    (review round 13: an unrelated sibling thread — a streaming
    foreachBatch callback, a user scheduler — must get Busy, not a free
    pass): delegation is explicit opt-in by the orchestration that
    spawned the worker, scoped to the with-block, touches no lock file,
    and raises if the process does not actually hold the lock.  The
    owner thread's token and heartbeat stay authoritative; exiting the
    delegation never releases the real lock."""
    keys = [(threading.get_ident(), str(lock_path_for(d, name)))
            for d in store_dirs]
    with _HELD_MU:
        missing = [k[1] for k in keys if k[1] not in _LIVE]
        if missing:
            raise MaintenanceBusy(
                f"delegation requested for locks this process does not "
                f"hold: {missing}")
        for k in keys:
            _HELD[k] = _HELD.get(k, 0) + 1
    try:
        yield
    finally:
        with _HELD_MU:
            for k in keys:
                n = _HELD.get(k, 0) - 1
                if n <= 0:
                    _HELD.pop(k, None)
                else:
                    _HELD[k] = n


@contextlib.contextmanager
def farm_locks(store_dirs, name: str = "maint", stale_s: float = _STALE_S):
    """Hold the locks of EVERY given store for the with-block — the
    composed-pass entry: sorted acquisition (no deadlock between two
    overlapping passes), all-or-nothing (a Busy mid-acquisition releases
    everything already taken before propagating)."""
    # dedup and order on the canonical LOCK path (realpath'd parent),
    # so two passes spelling the same store differently still agree on
    # one acquisition order and never double-acquire a physical store.
    dirs = [d for _, d in sorted(
        {str(lock_path_for(d, name)): str(Path(str(d).rstrip("/")))
         for d in store_dirs}.items())]
    with contextlib.ExitStack() as stack:
        for d in dirs:
            stack.enter_context(store_lock(d, name=name, stale_s=stale_s))
        yield
