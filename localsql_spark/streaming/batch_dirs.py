"""Retention for per-batch landing directories.

Every append-style streaming sink in this package lands micro-batches as
``<dir>/batch_<id>`` with overwrite semantics (idempotent redelivery),
which is exactly-once but grows one directory per micro-batch forever —
the classic many-small-files problem at continuous-ingest cadence.

This module folds old batch dirs into a single size-bounded generation
``<dir>/upto_<B>`` (B = highest folded batch id) with the same
commit discipline as the IVF index / SCD2 compactions:

- commit is ONE directory rename (staging -> ``upto_<B>``); the folded
  batch dirs and any previous generation stay on disk until after it, so
  no crash point loses rows;
- readers resolve BY NAME: the newest ``upto_<B>`` plus batch dirs with
  ``id > B`` — a crash after the commit but before cleanup leaves
  superseded dirs on disk but never double-reads them;
- a redelivered batch with ``id <= B`` (checkpoint replay across a
  compaction) must be SKIPPED by the writer, not rewritten —
  :func:`superseded` is that gate; its rows are already durable in the
  generation dir.

Single-writer maintenance step between stream drains, same contract as
the other compactions.  At 100 TB: each compaction reads only the folded
tail (bounded by compaction cadence x ingest rate), never the whole
accumulated corpus, and the generation dir is rewritten at most once per
maintenance run with ``target_files`` output files.
"""

from __future__ import annotations

import json
import os
import shutil
import warnings
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _gen_id(p: Path) -> int:
    return int(p.name.rsplit("_", 1)[1])


def note_blocker(state_file: Path, blocker: int | None, what: str) -> None:
    """Surface a wedged landing queue.  The ordered fold/compaction walks
    deliberately STOP at the first torn dir (no ``_SUCCESS``) or missing
    batch id — correct for ordering, but a dir that is never rewritten
    (stream dead, dir lost externally) would otherwise stall every later
    fold forever while the maintenance call just returns smaller counts.
    Callers record the blocking id here after each walk: the first
    sighting is normal (the stream usually rewrites the dir before the
    next maintenance call), but the SAME id blocking a second consecutive
    call raises a ``RuntimeWarning`` so the operator sees the wedge
    instead of silent rot.  Progress (``blocker=None`` or a different id)
    resets the sidecar."""
    if blocker is None:
        state_file.unlink(missing_ok=True)
        return
    try:
        prev = json.loads(state_file.read_text())
    except (OSError, ValueError):
        prev = None
    count = prev.get("count", 0) + 1 if (
        prev and prev.get("id") == blocker) else 1
    if count > 1:
        warnings.warn(
            f"{what}: batch id {blocker} has blocked maintenance for "
            f"{count} consecutive calls (torn landing dir never "
            f"rewritten, or an id gap that never fills) — no later "
            f"batch can fold until it lands; inspect the landing queue "
            f"or rebuild from the landed dirs", RuntimeWarning,
            stacklevel=3)
    tmp = Path(str(state_file) + ".tmp")
    tmp.write_text(json.dumps({"id": blocker, "count": count}))
    os.rename(tmp, state_file)


def compacted_through(dir_: str) -> int:
    """Highest batch id folded into a committed generation (-1 if none)."""
    gens = sorted(Path(dir_).glob("upto_*"), key=_gen_id)
    return _gen_id(gens[-1]) if gens else -1


def superseded(dir_: str, batch_id: int) -> bool:
    """True when a redelivered batch's rows are already durable in a
    generation dir — the writer must no-op instead of recreating the
    batch dir (which readers would then double-count)."""
    return batch_id <= compacted_through(dir_)


def _live_parts(dir_: str) -> tuple[Path | None, list[Path]]:
    root = Path(dir_)
    gens = sorted(root.glob("upto_*"), key=_gen_id)
    gen = gens[-1] if gens else None
    upto = _gen_id(gen) if gen else -1
    batches = sorted((p for p in root.glob("batch_*")
                      if _gen_id(p) > upto), key=_gen_id)
    return gen, batches


def read_batches(spark: SparkSession, dir_: str,
                 schema: str | None = None) -> DataFrame:
    """All COMMITTED rows: newest generation + non-superseded batch dirs.
    A batch dir without ``_SUCCESS`` is a partial landing or mid-rewrite
    (the stream will rewrite it) — excluded here exactly as the
    compaction and fold loops exclude it, so a reader can never see a
    torn subset of a batch or files from two write attempts.

    ``schema`` (DDL string) supplies an explicit scan schema — the
    schema-evolution readers pass the registry's evolved schema here so
    the committed-parts rule lives in exactly ONE place (review round
    13: the registered signature-store read had re-implemented it
    inline).  With a schema, an empty landing dir returns an empty
    frame of that shape; without one, the old recursive-read error
    shape is preserved."""
    gen, batches = _live_parts(dir_)
    paths = ([str(gen)] if gen else []) + \
        [str(p) for p in batches if (p / "_SUCCESS").exists()]
    rd = spark.read.option("recursiveFileLookup", "true")
    if schema is not None:
        rd = rd.schema(schema)
    if not paths:
        if schema is not None:
            return spark.createDataFrame([], schema)
        # empty landing dir: preserve the old recursive-read error shape
        return rd.parquet(dir_)
    return rd.parquet(*paths)


def fold_cutoff(dir_: str, keep_last: int = 1) -> int:
    """The batch id :func:`compact_batches` would fold through (-1 if
    nothing would fold) — lets a caller compacting PAIRED dirs (e.g. the
    dedup sink's corpus + signature store) pick one shared cutoff so the
    superseded gate stays consistent across both."""
    gen, batches = _live_parts(dir_)
    candidates = batches[:-keep_last] if keep_last > 0 else batches
    cutoff = -1
    prev = _gen_id(gen) if gen else -1
    for p in candidates:
        gid = _gen_id(p)
        if gid != prev + 1 or not (p / "_SUCCESS").exists():
            break  # id gap or partial landing: nothing above may fold
        cutoff = gid
        prev = gid
    return cutoff


def compact_batches(spark: SparkSession, dir_: str, *, keep_last: int = 1,
                    target_files: int = 4,
                    max_upto: int | None = None) -> int:
    """Fold all but the newest ``keep_last`` batch dirs (plus the previous
    generation) into ``upto_<B>``.  Returns the number of batch dirs
    folded (0 = nothing to do).  Crash-safe per the module docstring;
    leftovers from a crashed predecessor run are swept first.
    ``max_upto`` caps the fold at a caller-chosen batch id (paired-dir
    compaction; see :func:`fold_cutoff`)."""
    root = Path(dir_)
    gen, batches = _live_parts(dir_)
    upto = _gen_id(gen) if gen else -1
    # opportunistic recovery: stale staging, superseded batches/generations
    for stale in root.glob("_staging_upto_*"):
        shutil.rmtree(stale, ignore_errors=True)
    for p in root.glob("batch_*"):
        if _gen_id(p) <= upto:
            shutil.rmtree(p, ignore_errors=True)
    for g in root.glob("upto_*"):
        if gen is not None and _gen_id(g) < _gen_id(gen):
            shutil.rmtree(g, ignore_errors=True)
    candidates = batches[:-keep_last] if keep_last > 0 else batches
    # fold only the contiguous COMPLETE prefix OF IDS: a partially-landed
    # dir (no _SUCCESS — the stream will rewrite it) AND a wholly missing
    # intermediate id (dir lost externally, or a sink that skipped the
    # batch) must not end up below the generation watermark, where the
    # batch's redelivery would be skipped as superseded before its rows
    # ever became durable — same contiguity rule as
    # stream_rollup.prune_landed
    fold: list[Path] = []
    prev = upto
    blocker: int | None = None
    for p in candidates:
        gid = _gen_id(p)
        if gid != prev + 1:
            blocker = prev + 1  # missing intermediate id
            break
        if not (p / "_SUCCESS").exists():
            blocker = gid  # torn landing
            break
        if max_upto is not None and gid > max_upto:
            break  # caller-chosen cap, not a stall
        fold.append(p)
        prev = gid
    note_blocker(root / ".blocked_compact", blocker,
                 f"compact_batches({dir_})")
    if not fold:
        return 0
    new_upto = _gen_id(fold[-1])
    srcs = ([str(gen)] if gen else []) + [str(p) for p in fold]
    staged = root / f"_staging_upto_{new_upto}"
    (spark.read.option("recursiveFileLookup", "true").parquet(*srcs)
     .coalesce(target_files)
     .write.mode("overwrite").parquet(str(staged)))
    staged.rename(root / f"upto_{new_upto}")  # COMMIT — one rename
    # opportunistic cleanup; superseded by name whether or not this runs
    if gen is not None:
        shutil.rmtree(gen, ignore_errors=True)
    for p in fold:
        shutil.rmtree(p, ignore_errors=True)
    return len(fold)
