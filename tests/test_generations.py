"""Reader-atomic generation swaps (sinks/generations.py — r13 verdict
task 1): the store pointer is a symlink flipped with ONE atomic rename,
so lock-free readers never observe a missing or half-swapped store; the
displaced generation survives until the next swap (in-flight scans
finish), except on RTBF-motivated swaps which purge it immediately.

Plus the r13 advice fixes on sinks/locks.py: realpath-normalized lock
identity (spelling-independent exclusion AND reentrancy) and no
ownerless lock file after a failed token write.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

import pytest


def _write_built(parent: Path, value: int, name: str = "built") -> Path:
    import pyarrow as pa
    import pyarrow.parquet as pq

    built = parent / f".{name}.{value}"
    built.mkdir()
    pq.write_table(pa.table({"v": [value] * 4}), built / "part-0.parquet")
    return built


def _read_store(store: Path) -> list[int]:
    import pyarrow.parquet as pq

    return pq.read_table(store).column("v").to_pylist()


def test_first_swap_then_generations(tmp_path):
    """Fresh store: first commit creates the pointer; later commits flip
    it; content is always exactly one build's; at most current+displaced
    generations remain."""
    from localsql_spark.sinks.generations import (commit_store_swap,
                                                  current_generation,
                                                  generation_dirs)

    store = tmp_path / "store"
    commit_store_swap(store, _write_built(tmp_path, 0))
    assert store.is_symlink() and _read_store(store) == [0] * 4
    for v in (1, 2, 3):
        commit_store_swap(store, _write_built(tmp_path, v))
    assert _read_store(store) == [3] * 4
    gens = generation_dirs(str(store))
    assert len(gens) == 2  # current + displaced, older pruned
    assert current_generation(str(store)).name == gens[-1].name
    # relative symlink target: the farm can be moved as a unit
    assert "/" not in os.readlink(store)


def test_legacy_dir_converted_once(tmp_path):
    """A pre-generation real-dir store converts on its first swap; the
    parked legacy content is the displaced generation; subsequent swaps
    are pure flips."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from localsql_spark.sinks.generations import (commit_store_swap,
                                                  generation_dirs)

    store = tmp_path / "store"
    store.mkdir()
    pq.write_table(pa.table({"v": [99]}), store / "part-0.parquet")
    commit_store_swap(store, _write_built(tmp_path, 1))
    assert store.is_symlink() and _read_store(store) == [1] * 4
    gens = generation_dirs(str(store))
    assert len(gens) == 2
    assert _read_store(gens[0]) == [99]  # legacy parked as the lower gen


def test_heal_rolls_forward_after_mid_conversion_crash(tmp_path):
    """Crash between the conversion's two renames: pointer absent, both
    generations present — heal relinks the NEWEST (the completed
    replacement), i.e. rolls forward."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from localsql_spark.sinks.generations import heal_store

    store = tmp_path / "store"
    for n, v in ((0, 99), (1, 1)):
        g = tmp_path / f".store.gen-{n:08d}"
        g.mkdir()
        pq.write_table(pa.table({"v": [v]}), g / "part-0.parquet")
    heal_store(str(store))
    assert store.is_symlink() and _read_store(store) == [1]
    # idempotent
    heal_store(str(store))
    assert _read_store(store) == [1]


def test_rtbf_swap_purges_displaced(tmp_path):
    """retain_displaced=False (erase rewrite / post-erase rebuild /
    retrain): the displaced generation — the pre-erase bytes — is gone
    immediately after the flip, and so is every older one."""
    from localsql_spark.sinks.generations import (commit_store_swap,
                                                  generation_dirs)

    store = tmp_path / "store"
    commit_store_swap(store, _write_built(tmp_path, 0))
    commit_store_swap(store, _write_built(tmp_path, 1))
    assert len(generation_dirs(str(store))) == 2
    commit_store_swap(store, _write_built(tmp_path, 2),
                      retain_displaced=False)
    gens = generation_dirs(str(store))
    assert len(gens) == 1 and _read_store(store) == [2] * 4


def test_remove_store_deletes_pointer_and_generations(tmp_path):
    from localsql_spark.sinks.generations import (commit_store_swap,
                                                  remove_store)

    store = tmp_path / "store"
    commit_store_swap(store, _write_built(tmp_path, 0))
    commit_store_swap(store, _write_built(tmp_path, 1))
    remove_store(str(store))
    assert not store.is_symlink() and not store.exists()
    assert not any(tmp_path.glob(".store.gen-*"))


def test_concurrent_reader_survives_many_swaps(tmp_path):
    """THE reader-atomicity pin (r13 verdict task 1 'done' criterion):
    a lock-free reader loops over the store while the writer commits
    >= 100 swaps — zero read errors, and every read observes exactly
    one complete generation's content.  The old two-rename protocol had
    a store-missing window between its renames; the pointer flip has
    none."""
    from localsql_spark.sinks.generations import commit_store_swap

    store = tmp_path / "store"
    commit_store_swap(store, _write_built(tmp_path, 0, "b0"))
    errors: list[BaseException] = []
    torn: list[list[int]] = []
    reads = [0]
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                vals = _read_store(store)
            except BaseException as e:  # noqa: BLE001 — the assertion IS "none"
                errors.append(e)
                return
            if len(set(vals)) != 1 or len(vals) != 4:
                torn.append(vals)
                return
            reads[0] += 1

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for v in range(1, 121):  # 120 swaps
            commit_store_swap(store, _write_built(tmp_path, v, f"b{v}"))
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert errors == [], errors
    assert torn == [], torn
    assert reads[0] > 100  # the loop really ran against the swaps
    assert _read_store(store) == [120] * 4


# ---------------------------------------------------------------------------
# locks.py advice fixes
# ---------------------------------------------------------------------------

def test_lock_identity_is_spelling_independent(tmp_path):
    """advice r13 (medium): relative vs absolute, '..'-spelled, and
    symlinked-parent spellings of one physical store must key ONE lock
    file — cross-thread contention across spellings, same-thread
    reentrancy across spellings."""
    from localsql_spark.sinks.locks import (MaintenanceBusy, lock_path_for,
                                            store_lock)

    real = tmp_path / "farm" / "store"
    real.parent.mkdir()
    real.mkdir()
    alias_parent = tmp_path / "link"
    alias_parent.symlink_to(tmp_path / "farm")
    spellings = [
        str(real),
        str(tmp_path / "farm" / "x" / ".." / "store"),
        str(alias_parent / "store"),
    ]
    locks = {str(lock_path_for(s)) for s in spellings}
    assert len(locks) == 1, locks

    with store_lock(spellings[0]):
        # same thread, different spelling: REENTRANT (not spurious Busy)
        with store_lock(spellings[2]):
            pass
        # other thread, different spelling: real contention
        got: list[BaseException | None] = []

        def contend():
            try:
                with store_lock(spellings[1]):
                    got.append(None)
            except MaintenanceBusy as e:
                got.append(e)

        t = threading.Thread(target=contend)
        t.start()
        t.join()
        assert isinstance(got[0], MaintenanceBusy)


def test_failed_token_write_leaves_no_ownerless_lock(tmp_path, monkeypatch):
    """advice r13 (low): if the token write fails right after the O_EXCL
    create, the just-created lock file must be unlinked on the way out —
    otherwise the store is locked out for stale_s with no live holder."""
    from localsql_spark.sinks import locks as L

    store = tmp_path / "store"
    store.mkdir()
    real_write = os.write

    def boom(fd, data):
        raise OSError("disk full")

    monkeypatch.setattr(os, "write", boom)
    with pytest.raises(OSError, match="disk full"):
        with L.store_lock(str(store)):
            pass
    monkeypatch.setattr(os, "write", real_write)
    assert not L.lock_path_for(str(store)).exists()
    with L.store_lock(str(store)):  # immediately acquirable again
        pass


def test_stream_ingest_append_respects_store_lock(spark, tmp_path):
    """advice r13 (medium): the streaming dedup-ingest sink's signature
    append is the one genuinely concurrent producer — while maintenance
    holds the store lock the batch must raise MaintenanceBusy (so the
    un-advanced checkpoint redelivers it) instead of landing a batch dir
    the compactor's swap would ride off with."""
    from localsql_spark.sinks.locks import MaintenanceBusy, store_lock
    from localsql_spark.streaming.stream_dedup_ingest import \
        dedup_ingest_batch

    store = tmp_path / "sigs"
    out = tmp_path / "accepted"
    store.mkdir()
    out.mkdir()
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string")

    got: list[BaseException] = []

    def run_batch():
        try:
            dedup_ingest_batch(batch, 0, store_dir=str(store),
                               out_dir=str(out))
        except MaintenanceBusy as e:
            got.append(e)

    with store_lock(str(store)):
        t = threading.Thread(target=run_batch)
        t.start()
        t.join()
    assert got and isinstance(got[0], MaintenanceBusy)
    assert not any(store.glob("batch_*"))  # nothing landed
    # lock released: the redelivered batch commits both sinks
    n = dedup_ingest_batch(batch, 0, store_dir=str(store),
                           out_dir=str(out))
    assert n == 2
    assert any(store.glob("batch_*"))


def test_prune_generations_sweeps_orphans(tmp_path):
    """A commit that renamed its build into a gen dir but crashed before
    the flip leaves an orphan; prune keeps current + displaced and
    sweeps the rest (the nightly-maintenance sweep)."""
    from localsql_spark.sinks.generations import (commit_store_swap,
                                                  current_generation,
                                                  generation_dirs,
                                                  prune_generations)

    store = tmp_path / "store"
    commit_store_swap(store, _write_built(tmp_path, 0))
    commit_store_swap(store, _write_built(tmp_path, 1))
    # simulate the crashed commit: a build renamed to a HIGHER gen, no flip
    orphan = tmp_path / ".store.gen-00000009"
    _write_built(tmp_path, 9, "orph").rename(orphan)
    assert len(generation_dirs(str(store))) == 3
    cur = current_generation(str(store))
    removed = prune_generations(str(store))
    assert removed == 1 and not orphan.exists()
    assert current_generation(str(store)) == cur
    assert _read_store(store) == [1] * 4
    assert prune_generations(str(store)) == 0  # idempotent
