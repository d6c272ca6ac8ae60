"""Entity resolution (record linkage): find records that refer to the
same real-world entity despite textual differences, and canonicalize
them to one entity id.

The classic two-stage shape (Fellegi & Sunter, JASA 1969; survey:
Christen, "Data Matching", Springer 2012 — public literature):

1. **Blocking** bounds the candidate space: records only compare within
   a block of cheap invariants (here: exact equality on chosen columns).
   Without it, matching is |R|² comparisons — a non-starter at 100 TB.
   With it, cost is Σ|block|², driven by the largest block, so hot
   blocks can be capped (dropped with a logged trade, the same
   discipline as dedup's ``_drop_hot_buckets``).
2. **Pairwise matching** scores candidates with an edit-distance
   similarity; pairs under ``max_dist`` are declared matches.

Canonicalization reuses the verified min-label-propagation connected
components from ``operators.dedup``: entity id = the smallest record id
in each match cluster, singletons map to themselves.

Scale shape: one equi-join per blocking pass (shuffle on the block key,
never a cross join), `levenshtein` evaluates JVM-side inside codegen,
and the components loop is diameter-bounded joins over match edges only
(matches ≪ records).  All deterministic and oracle-expressible —
DuckDB's ``levenshtein`` computes the same unit-cost edit distance as
Spark's.

The reference delegates all matching to SQLite equality (reference:
localsql/localsql.py:230 — no fuzzy matching surface); this family is a
pure extension for training-data curation (author/source dedup, URL
canonicalization, contributor identity stitching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from localsql_spark.operators.dedup import connected_components


def blocked_edit_matches(df: DataFrame, id_col: str, attr_col: str,
                         block_cols: list[str], max_dist: int = 1,
                         block_cap: int | None = None) -> DataFrame:
    """Match pairs within blocks by edit distance: records sharing every
    ``block_cols`` value are compared pairwise (id_a < id_b once), kept
    when ``levenshtein(attr_a, attr_b) <= max_dist``.

    Returns (id_a, id_b, dist, sim) where sim = 1 - dist/max(len) — the
    normalized edit similarity.  ``block_cap`` drops blocks larger than
    the cap BEFORE the self-join (a degenerate block — empty attr, junk
    default — would otherwise contribute |block|² comparisons); dropped
    blocks trade recall for a hard cost bound, the documented blocking
    trade."""
    recs = (df.select(F.col(id_col).alias("_id"),
                      F.col(attr_col).alias("_attr"),
                      *[F.col(c) for c in block_cols]))
    if block_cap is not None:
        from pyspark.sql.window import Window

        wb = Window.partitionBy(*block_cols)
        recs = (recs.withColumn("_bn", F.count(F.lit(1)).over(wb))
                .filter(F.col("_bn") <= block_cap).drop("_bn"))
    # Optimization r15 (guide §8: decide on a small proxy, attach after):
    # the edit distance is a pure function of the NAME pair, so compare
    # each DISTINCT (block, attr) pair once and expand the survivors back
    # to id pairs with two equi-joins.  Duplicate attribute values are
    # the norm in entity-resolution inputs (that is what ER exists for),
    # and under r-fold duplication the |block|² levenshtein work drops
    # r²-fold while the expansion cost tracks the MATCH count — the sf1.0
    # profile measured 90.8M pair evaluations (345 CPU-seconds) where
    # only 1.8M distinct name pairs exist.  The id-pair set and its
    # dist/sim values are identical by construction: (id_a, id_b) is
    # generated exactly once, through its own ordered name pair, and the
    # id_a < id_b filter keeps the same orientation as before.  NULL
    # attrs drop in both forms (levenshtein(NULL,·) fails the dist gate;
    # an equi-join key never matches NULL).
    dn = recs.select(*block_cols, "_attr").distinct()
    na = dn.select(*block_cols, F.col("_attr").alias("_attr_a"))
    nb = dn.select(*block_cols, F.col("_attr").alias("_attr_b"))
    # The distinct-name-pair expansion AND the per-pair levenshtein both
    # evaluate INSIDE the join stage, whose width AQE sizes from the tiny
    # shuffled input BYTES — at sf0.1 that serialized ~1.8M edit distances
    # onto 2 post-shuffle tasks (r14 profile: one 3.9s stage, 2 tasks).
    # In the small-input regime, broadcast the probe side instead: the
    # join then runs over the distinct exchange's partitions at full
    # width.  At real scale the estimate gate keeps the shuffled block
    # join (a corpus-sized side must never broadcast).
    from localsql_spark.operators import small_input_regime, spread

    if small_input_regime(df):
        na = spread(na)
        nb = F.broadcast(nb)
    dist = F.levenshtein(F.col("_attr_a"), F.col("_attr_b"))
    name_pairs = (na.join(nb, block_cols)
                  .withColumn("dist", dist)
                  .filter(F.col("dist") <= max_dist)
                  .select(*block_cols, "_attr_a", "_attr_b", "dist",
                          # two EMPTY attrs pass the dist gate with maxlen
                          # 0; they are identical, so sim is 1.0 — a bare
                          # division raises DIVIDE_BY_ZERO under ANSI mode
                          # and kills the whole ER job on one degenerate
                          # pair
                          F.round(F.when(
                              F.greatest(F.length("_attr_a"),
                                         F.length("_attr_b")) == 0,
                              F.lit(1.0))
                              .otherwise(F.lit(1.0) - F.col("dist")
                                         / F.greatest(F.length("_attr_a"),
                                                      F.length("_attr_b"))
                                         .cast("double")), 9).alias("sim")))
    a = recs.select(F.col("_id").alias("id_a"),
                    F.col("_attr").alias("_attr_a"), *block_cols)
    b = recs.select(F.col("_id").alias("id_b"),
                    F.col("_attr").alias("_attr_b"), *block_cols)
    return (a.join(name_pairs, [*block_cols, "_attr_a"])
            .join(b, [*block_cols, "_attr_b"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "dist", "sim"))


def resolve_entities(df: DataFrame, matches: DataFrame,
                     id_col: str) -> DataFrame:
    """Canonical entity id per record: connected components over the
    match pairs (entity id = min record id in the cluster), singletons
    resolving to themselves.  Returns every input record as
    (id, entity_id).  The components loop runs over match EDGES only —
    its cost tracks the match count, not the record count; the final
    assignment is one left join."""
    cc = connected_components(
        matches.select(F.col("id_a").alias("doc_a"),
                       F.col("id_b").alias("doc_b")), base=df)
    # join strategy left to AQE: the cc side tracks match count (usually
    # broadcastable, but unbounded in a pathological corpus)
    return (df.select(F.col(id_col).alias("id"))
            .join(cc.withColumnRenamed("node", "id"), "id", "left")
            .select("id", F.coalesce("cluster_id", "id")
                    .alias("entity_id")))


def sorted_neighborhood_matches(df: DataFrame, id_col: str, attr_col: str,
                                block_cols: list[str], window: int = 4,
                                max_dist: int = 1) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo,
    SIGMOD 1995 — public literature): within each block, records sort by
    (attribute, id) and only pairs within ``window`` positions compare.

    This is the other answer to hot blocks: ``blocked_edit_matches``'s
    ``block_cap`` DROPS an oversized block (recall loss, hard cost
    bound); sorted-neighborhood KEEPS it at O(|block| x window)
    comparisons instead of O(|block|^2) — the trade is that only pairs
    the sort order brings near each other are considered (textually
    close attributes usually are; a multi-pass over different sort keys
    recovers more).  Returns the same (id_a, id_b, dist, sim) shape as
    ``blocked_edit_matches`` (ids normalized id_a < id_b) so
    :func:`resolve_entities` composes with either, or with the UNION of
    passes.

    Scale shape: the rank is a window function partitioned by the block
    key — one shuffle, no global ordering bottleneck; the neighbor pairs
    come from an equi-join on (block, rank) against a (window-1)-fold
    explode, so the join fan-out is exactly |records| x (window-1)
    candidates before the edit-distance gate, whatever the block size.
    """
    from pyspark.sql.window import Window

    wb = Window.partitionBy(*block_cols).orderBy("_attr", "_id")
    recs = (df.select(F.col(id_col).alias("_id"),
                      F.col(attr_col).alias("_attr"),
                      *[F.col(c) for c in block_cols])
            .withColumn("_rank", F.row_number().over(wb)))
    a = (recs.select(*block_cols, F.col("_rank").alias("_ra"),
                     F.col("_id").alias("_ida"),
                     F.col("_attr").alias("_attra"),
                     # python-side range: F.sequence(1, 0) would emit a
                     # DESCENDING [1, 0] for window<=1 — self-pairs at
                     # offset 0 — instead of no offsets at all
                     F.explode(F.array(*[F.lit(i)
                                         for i in range(1, window)]))
                     .alias("_off"))
         # the partner's rank joins as an EQUI key (block, rank): the hash
         # join emits exactly the |records| x (window-1) candidates — rank
         # distance as a post-join filter would fan out |block|^2 first
         .withColumn("_rb", F.col("_ra") + F.col("_off")))
    b = recs.select(*block_cols, F.col("_rank").alias("_rb"),
                    F.col("_id").alias("_idb"),
                    F.col("_attr").alias("_attrb"))
    dist = F.levenshtein(F.col("_attra"), F.col("_attrb"))
    return (a.join(b, [*block_cols, "_rb"], "inner")
            .withColumn("dist", dist)
            .filter(F.col("dist") <= max_dist)
            .select(F.least("_ida", "_idb").alias("id_a"),
                    F.greatest("_ida", "_idb").alias("id_b"),
                    "dist",
                    F.round(F.when(
                        F.greatest(F.length("_attra"),
                                   F.length("_attrb")) == 0, F.lit(1.0))
                        .otherwise(F.lit(1.0) - F.col("dist")
                                   / F.greatest(F.length("_attra"),
                                                F.length("_attrb"))
                                   .cast("double")), 9).alias("sim")))


def fs_match_scores(df: DataFrame, candidates: DataFrame, id_col: str,
                    fields: list[str], m: float = 0.9) -> DataFrame:
    """Fellegi-Sunter probabilistic match scoring (Fellegi & Sunter,
    JASA 1969 — public): each candidate pair scores the sum of per-field
    agreement weights

        agree:    ln(m / u_j)          disagree: ln((1-m) / (1-u_j))

    where ``u_j`` — the chance a NON-match agrees on field j by
    accident — is estimated from the data as the field's value-collision
    probability Σ_v (n_v/N)², and ``m`` (the chance a true match agrees)
    is the supplied clerical parameter.  A rare-value agreement (phone
    prefix) therefore counts far more than a common-value one (market
    segment), which is the entire point over naive attribute counting.

    Scale shape: u_j is one tiny aggregate per field broadcast as a
    1-row frame; the pair scoring is row-local arithmetic over the
    candidate list (already bounded by blocking), with a fixed-order
    double expression rounded to 9 so the oracle replays it exactly.
    Returns (id_a, id_b, n_agree, score) — rank/threshold downstream.
    """
    import math

    out = candidates.select("id_a", "id_b")
    recs = df.select(F.col(id_col).alias("_id"),
                     *[F.col(f) for f in fields])
    a = recs.select(F.col("_id").alias("id_a"),
                    *[F.col(f).alias(f"_a_{f}") for f in fields])
    b = recs.select(F.col("_id").alias("id_b"),
                    *[F.col(f).alias(f"_b_{f}") for f in fields])
    out = out.join(a, "id_a").join(b, "id_b")
    n = df.count()
    score = None
    n_agree = None
    for f_ in fields:
        u_frame = (df.groupBy(f_).agg(F.count(F.lit(1)).alias("_n"))
                   .agg((F.sum(F.col("_n") * F.col("_n")).cast("double")
                         / F.lit(float(n * n))).alias(f"_u_{f_}")))
        out = out.crossJoin(F.broadcast(u_frame))
        agree = F.col(f"_a_{f_}").eqNullSafe(F.col(f"_b_{f_}"))
        w = F.when(agree,
                   F.log(F.lit(m) / F.col(f"_u_{f_}"))
                   ).otherwise(F.log(F.lit(1.0 - m)
                                     / (F.lit(1.0) - F.col(f"_u_{f_}"))))
        score = w if score is None else score + w
        ag = agree.cast("int")
        n_agree = ag if n_agree is None else n_agree + ag
    return out.select("id_a", "id_b", n_agree.alias("n_agree"),
                      F.round(score, 9).alias("score"))
