"""Reader-atomic whole-store replacement via generation dirs + a
symlink flip — closing the r13 verdict's top task: ``_swap_rebuilt``
and its siblings committed with TWO renames, and between
``rename(dst, old)`` and ``rename(built, dst)`` the live store path
did not exist, so a concurrent reader (which takes no lock by design)
saw FileNotFound or schema-inferred over nothing.

Layout
------
The store path becomes a SYMLINK to a sibling generation directory::

    parent/
      store            -> .store.gen-00000003        (the live pointer)
      .store.gen-00000002/   ... previous generation (kept until next swap)
      .store.gen-00000003/   ... current generation

Commit is ONE atomic rename: build the replacement, ``rename`` it to a
fresh generation dir, create a temp symlink pointing at it, and
``os.rename(tmp_link, store)`` — POSIX atomically replaces the old
symlink, so every reader resolution sees either the old or the new
generation, never a missing or half-swapped store.  Readers need ZERO
changes: the OS resolves the symlink on every open, Spark and DuckDB
both read straight through it.

Retention: the immediately-displaced generation survives until the
NEXT swap commits, so a reader that resolved the pointer just before a
flip finishes its scan against intact files; older generations (and
never-flipped orphans from a crash between build and flip) are pruned
at each commit.  Disk high-water is therefore 2x the store — the same
bound the build staging already implied.

Legacy stores (a real directory at the store path) are converted on
their first swap.  That one-time conversion is the old two-rename
dance (a real dir cannot be atomically replaced by a symlink), so it
keeps the old crash/reader window ONCE; the legacy content is parked
as the lower-numbered generation so :func:`heal_store` rolls FORWARD
to the completed replacement after a mid-conversion crash.  Every swap
after conversion is single-rename atomic.

Writers hold the store's maintenance lock (``sinks.locks``) around
build + commit, exactly as before; this module only changes what the
commit does.  ``lock_path_for`` deliberately does not realpath the
store's final component, so the lock stays keyed by the store's
logical name across generation flips.

Object-store caveat (same as the locks'): symlinks are a POSIX-fs
mechanism; on S3-like stores the equivalent is a pointer OBJECT naming
the current generation prefix, compare-and-swapped — the layout here
is deliberately isomorphic to that design.
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path

__all__ = ["commit_store_swap", "heal_store", "remove_store",
           "generation_dirs", "current_generation"]

_GEN_RE = re.compile(r"\.(?P<store>.+)\.gen-(?P<n>\d{8})$")


def _gen_name(store: Path, n: int) -> Path:
    return store.parent / f".{store.name}.gen-{n:08d}"


def generation_dirs(store_dir: str) -> list[Path]:
    """All generation dirs for a store, oldest first."""
    store = Path(str(store_dir).rstrip("/"))
    prefix = f".{store.name}.gen-"
    try:
        names = sorted(p for p in os.listdir(store.parent)
                       if p.startswith(prefix)
                       and _GEN_RE.match(p)
                       and _GEN_RE.match(p).group("store") == store.name)
    except FileNotFoundError:
        return []
    return [store.parent / p for p in names]


def current_generation(store_dir: str) -> Path | None:
    """The generation dir the store pointer currently serves, or None
    for a legacy real-dir / missing store."""
    store = Path(str(store_dir).rstrip("/"))
    if store.is_symlink():
        return store.parent / os.readlink(store)
    return None


def heal_store(store_dir: str) -> None:
    """Recover a store whose one-time legacy conversion crashed between
    its two renames: the pointer is absent but generation dirs exist.
    Relink the NEWEST generation — the conversion numbers the parked
    legacy content BELOW the completed replacement, so newest == roll
    forward.  No-op when the store path exists (dir or live symlink).
    Called by swap writers on entry; readers stay read-only."""
    store = Path(str(store_dir).rstrip("/"))
    if store.is_symlink():
        if not store.exists():  # dangling pointer: target pruned/crashed
            gens = [g for g in generation_dirs(store_dir) if g.is_dir()]
            if gens:
                _flip(store, gens[-1])
        return
    if store.exists():
        return
    gens = [g for g in generation_dirs(store_dir) if g.is_dir()]
    if gens:
        _flip(store, gens[-1])


def _flip(store: Path, gen: Path) -> None:
    """The atomic commit: temp symlink -> rename over the pointer.
    Relative target, so the whole farm can be moved as a unit."""
    tmp = store.parent / f".{store.name}.lnk.{os.getpid()}.{os.urandom(4).hex()}"
    os.symlink(gen.name, tmp)
    try:
        os.rename(tmp, store)  # COMMIT — one atomic rename
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def commit_store_swap(dst: Path, built: Path,
                      retain_displaced: bool = True) -> None:
    """Replace store ``dst``'s contents with the fully-built sibling dir
    ``built`` — reader-atomically (see module docstring).  The caller
    holds ``dst``'s maintenance lock and has already carried the
    schema-evolution registry into ``built``.  ``built`` is consumed
    (renamed away) on success.

    ``retain_displaced=False`` deletes the displaced generation
    IMMEDIATELY after the flip instead of keeping it for in-flight
    readers: the right-to-be-forgotten swaps (erase rewrite, banded
    rebuild from a post-erase store, non-retractable retrain) must not
    leave the pre-erase bytes parked in a sibling dir until some future
    swap.  The pointer itself still never dangles — a reader resolving
    mid-flip sees old-or-new, never missing — but a scan IN FLIGHT at
    flip time can lose its files, the documented reads-under-erasure
    tradeoff (compliance wins)."""
    dst = Path(str(dst).rstrip("/"))
    built = Path(str(built).rstrip("/"))
    heal_store(str(dst))
    gens = generation_dirs(str(dst))
    next_n = 0
    if gens:
        next_n = int(_GEN_RE.match(gens[-1].name).group("n")) + 1

    if dst.is_symlink():
        displaced = current_generation(str(dst))
        new_gen = _gen_name(dst, next_n)
        os.rename(built, new_gen)
        _flip(dst, new_gen)  # COMMIT
        keep = {new_gen.name}
        if retain_displaced and displaced is not None:
            keep.add(displaced.name)
        for g in generation_dirs(str(dst)):
            if g.name not in keep:
                shutil.rmtree(g, ignore_errors=True)
        return

    if dst.exists():
        # one-time legacy conversion: park the real dir as the LOWER
        # generation, the replacement as the higher, then link.  The
        # store path is missing for the two renames between park and
        # flip — the documented one-time window; heal_store rolls
        # forward (newest gen) if we crash inside it.
        legacy_gen = _gen_name(dst, next_n)
        new_gen = _gen_name(dst, next_n + 1)
        os.rename(built, new_gen)
        os.rename(dst, legacy_gen)  # window opens
        _flip(dst, new_gen)         # window closes; COMMIT
        if not retain_displaced:
            shutil.rmtree(legacy_gen, ignore_errors=True)
        return

    # store never existed: first generation, no window at all
    new_gen = _gen_name(dst, next_n)
    os.rename(built, new_gen)
    _flip(dst, new_gen)


def prune_generations(store_dir: str, keep: int = 2) -> int:
    """Sweep generation debris beyond the newest ``keep`` dirs (default:
    current + displaced — the per-commit retention rule).  Covers the
    crash window where a commit renamed its build into a generation dir
    but died before the flip: that orphan would otherwise wait for the
    next swap.  Returns the number of dirs removed.  Callers hold the
    store's maintenance lock (a live commit is also pruning)."""
    gens = [g for g in generation_dirs(store_dir) if g.is_dir()]
    current = current_generation(store_dir)
    if current is None:
        # no pointer (legacy real dir, or nothing): keep the newest few
        # so heal_store can still roll forward
        keep_names = {g.name for g in gens[-keep:]}
    else:
        # retention is keyed off the POINTER, not raw numbering: an
        # orphan from a crashed commit is numbered ABOVE current and
        # must go, while the displaced generation (newest BELOW
        # current) must stay for in-flight readers
        keep_names = {current.name}
        below = [g for g in gens if g.name < current.name]
        keep_names.update(g.name for g in below[-(keep - 1):] if keep > 1)
    removed = 0
    for g in gens:
        if g.name not in keep_names:
            shutil.rmtree(g, ignore_errors=True)
            removed += 1
    return removed


def remove_store(store_dir: str) -> None:
    """Delete a store wholesale — pointer (or legacy real dir) AND every
    generation.  ``shutil.rmtree`` on a symlink raises, so whole-store
    deletion sites must use this instead."""
    store = Path(str(store_dir).rstrip("/"))
    if store.is_symlink():
        store.unlink(missing_ok=True)
    else:
        shutil.rmtree(store, ignore_errors=True)
    for g in generation_dirs(store_dir):
        shutil.rmtree(g, ignore_errors=True)
