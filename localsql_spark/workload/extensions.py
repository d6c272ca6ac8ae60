"""North-star extensions (BASELINE.json): dedup, similarity search, text
analysis over the driver's documents/embeddings tables.

Every oracle reproduces the operator's exact algorithm in DuckDB SQL
(portable md5-derived hashes, decimal-summed float reductions), so the
correctness gate checks the real computation, not a proxy.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.operators import spread
from localsql_spark.operators import dedup as D
from localsql_spark.operators import similarity as S
from localsql_spark.operators import text as T
from localsql_spark.workload import load, query

# Shared oracle fragment: normalized text + distinct 3-word shingles,
# mirroring operators.text.normalize_text / word_shingles.
def _shingles_cte(src: str = "documents") -> str:
    return r"""
norm AS (SELECT doc_id, lang,
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
         FROM SRC),""".replace("SRC", src) + r"""
tok AS (SELECT doc_id, lang, string_split(t, ' ') AS toks FROM norm),
sh AS (SELECT DISTINCT doc_id, lang,
              concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS s
       FROM tok, UNNEST(range(greatest(len(toks) - 2, 1))) u(i))
"""


_SHINGLES_CTE = _shingles_cte()  # single source of truth for the fragment


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query("text_token_stats", oracle=r"""
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END
            AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS word_tokens,
       CAST(length(text) AS BIGINT) AS chars,
       (CAST(length(text) AS BIGINT) = n_chars) AS chars_match
FROM documents
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens. Row-local,
    codegen'd, zero shuffles (operators.text)."""
    docs = load(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).alias("ws_tokens"),
        T.token_count_words(F.col("text")).alias("word_tokens"),
        F.length("text").cast("long").alias("chars"),
        (F.length("text").cast("long") == F.col("n_chars")).alias("chars_match"))


@query("text_quality_scores", oracle=r"""
WITH norm AS (
  SELECT doc_id, text, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents)
SELECT doc_id,
       CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
       CAST(length(regexp_replace(t, '\s', '', 'g')) AS DOUBLE)
         / len(string_split(t, ' ')) AS avg_wlen,
       CAST(len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
         / NULLIF(length(text), 0) AS punct_r,
       CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
         / NULLIF(length(text), 0) AS digit_r,
       CAST((length(text) BETWEEN 50 AND 20000) AS INT)
         + CAST((CAST(len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE) / NULLIF(length(text), 0) < 0.10) AS INT)
         + CAST((CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / NULLIF(length(text), 0) < 0.20) AS INT)
         + CAST((CAST(length(regexp_replace(t, '\s', '', 'g')) AS DOUBLE) / len(string_split(t, ' ')) BETWEEN 2.0 AND 12.0) AS INT)
         AS quality
FROM norm
""")
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length / punctuation / digit ratios, avg word
    length, composite 0-4 score (operators.text.quality_score)."""
    docs = load(spark, sf_dir)["documents"]
    t = T.normalize_text(F.col("text"))
    n_words = F.size(F.split(t, " "))
    avg_wlen = (F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_words)
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        avg_wlen.alias("avg_wlen"),
        T.punct_ratio(F.col("text")).alias("punct_r"),
        T.digit_ratio(F.col("text")).alias("digit_r"),
        (F.length("text").between(50, 20000).cast("int")
         + (T.punct_ratio(F.col("text")) < 0.10).cast("int")
         + (T.digit_ratio(F.col("text")) < 0.20).cast("int")
         + avg_wlen.between(2.0, 12.0).cast("int")).cast("long").alias("quality"))


def _langid_oracle() -> str:
    pad = "concat(' ', lower(text), ' ')"
    score = {
        lang: " + ".join(f"CAST(contains({pad}, ' {w} ') AS INT)" for w in words)
        for lang, words in T.LANG_STOPWORDS.items()
    }
    scores_sql = ",\n       ".join(f"({expr}) AS score_{lang}"
                                   for lang, expr in score.items())
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in T.LANG_STOPWORDS) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} AND {best} > 0 THEN '{lang}'"
        for lang in T.LANG_STOPWORDS) + " ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {scores_sql}
  FROM documents)
SELECT doc_id, lang AS lang_true, {case} AS lang_pred,
       ({case} = lang) AS is_match
FROM scored
"""


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID (operators.text.langid): argmax of
    per-language stopword hits, fixed tie order, 'und' when nothing hits."""
    docs = load(spark, sf_dir)["documents"]
    pred = T.langid(F.col("text"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("is_match"))


@query("text_fingerprint", oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5,
       CAST('0x' || substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS BIGINT) AS fp_h32
FROM documents
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of normalized text + 32-bit numeric variant
    (operators.text.fingerprint_*)."""
    docs = load(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        T.fingerprint_md5(F.col("text")).alias("fp_md5"),
        T.fingerprint_h32(F.col("text")).alias("fp_h32"))


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@query("dedup_exact_documents", oracle=r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_hash,
       min(doc_id) AS keep_id,
       count(*) AS copies
FROM documents
GROUP BY 1
""")
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the content hash
    (operators.dedup.exact_dedup)."""
    docs = load(spark, sf_dir)["documents"]
    return D.exact_dedup(docs)


# One md5 per shingle -> n affine permutations (a_j*h + b_j) mod P; exact
# mirror of operators.dedup.minhash_signature.
_MH_CTE = f"""
mh AS (SELECT doc_id, j,
              min(((CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {D.MINHASH_P})
                   * ((1103515245 * (j + 1) + 12345) % {D.MINHASH_P})
                   + (2654435761 * (j + 1) + 1013904223) % {D.MINHASH_P})
                  % {D.MINHASH_P}) AS c
       FROM sh CROSS JOIN UNNEST(range({D.N_MINHASH})) u2(j)
       GROUP BY doc_id, j)
"""


@query("dedup_minhash_signature", oracle=f"""
WITH {_SHINGLES_CTE},
{_MH_CTE}
SELECT doc_id, string_agg(CAST(c AS VARCHAR), '|' ORDER BY j) AS sig
FROM mh GROUP BY doc_id
""")
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures ({n} components: one md5 per shingle + affine
    permutations, single-pass fold) — the per-document half of MinHash-LSH,
    fully row-local (operators.dedup.minhash_signature).""".format(n=D.N_MINHASH)
    docs = load(spark, sf_dir)["documents"]
    sig = D.minhash_signature(F.col("text"))
    return docs.select(
        "doc_id",
        F.concat_ws("|", F.transform(sig, lambda c: c.cast("string")))
         .alias("sig"))


def _minhash_pairs_sql(src: str = "documents") -> str:
    return f"""
WITH {_shingles_cte(src)},
{_MH_CTE},
sig AS (SELECT doc_id, list(c ORDER BY j) AS sig FROM mh GROUP BY doc_id),
bands AS (SELECT doc_id, b,
                 md5(CAST(sig[4*b+1] AS VARCHAR) || '|' || CAST(sig[4*b+2] AS VARCHAR)
                     || '|' || CAST(sig[4*b+3] AS VARCHAR) || '|' || CAST(sig[4*b+4] AS VARCHAR)) AS bkey
          FROM sig CROSS JOIN UNNEST(range({D.N_BANDS})) u3(b)),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bands x JOIN bands y ON x.b = y.b AND x.bkey = y.bkey
                       AND x.doc_id < y.doc_id),
pairsig AS (SELECT doc_a, doc_b, sa.sig AS sig_a, sb.sig AS sig_b
            FROM cand JOIN sig sa ON sa.doc_id = doc_a
                      JOIN sig sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b,
       CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1] THEN 1 ELSE 0 END) AS DOUBLE)
         / {D.N_MINHASH} AS est_jaccard
FROM pairsig CROSS JOIN UNNEST(range({D.N_MINHASH})) u4(j)
GROUP BY doc_a, doc_b
HAVING CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1] THEN 1 ELSE 0 END) AS DOUBLE)
         / {D.N_MINHASH} >= 0.5
"""


_MINHASH_PAIRS_ORACLE = _minhash_pairs_sql()


@query("dedup_minhash_pairs", oracle=_MINHASH_PAIRS_ORACLE)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: banded bucket self-join (linear in
    docs x bands, never O(n^2)) then signature-overlap estimate
    (operators.dedup.minhash_lsh_pairs)."""
    docs = load(spark, sf_dir)["documents"]
    return D.minhash_lsh_pairs(docs, threshold=0.5)


@query("dedup_simhash", oracle=r"""
WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
tok AS (SELECT DISTINCT doc_id, tk
        FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM norm)),
h AS (SELECT doc_id, CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) AS h FROM tok),
votes AS (SELECT doc_id, i,
                 sum(CASE WHEN (h & (CAST(1 AS BIGINT) << i)) <> 0 THEN 1 ELSE -1 END) AS v
          FROM h CROSS JOIN UNNEST(range(32)) u(i)
          GROUP BY doc_id, i)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — row-local bit-vote expression
    (operators.dedup.simhash32); near-dups then cluster by hamming distance."""
    docs = load(spark, sf_dir)["documents"]
    return docs.select("doc_id", D.simhash32(F.col("text")).alias("simhash"))


@query("dedup_ngram_jaccard", oracle=f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang
                                AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id
           JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard for same-language pairs via an inverted-
    index join (operators.dedup.ngram_jaccard_pairs)."""
    docs = load(spark, sf_dir)["documents"]
    return D.ngram_jaccard_pairs(docs, block_col="lang", threshold=0.2)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COSINE_ORACLE_BODY = """
qe AS (SELECT query_id, generate_subscripts(qv, 1) AS p, unnest(qv) AS x FROM q),
ce AS (SELECT neighbor_id, generate_subscripts(cv, 1) AS p, unnest(cv) AS y FROM c),
dots AS (SELECT query_id, neighbor_id,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                              AS DECIMAL(38,12))) AS DOUBLE) AS dotp
         FROM qe JOIN ce ON qe.p = ce.p
         WHERE query_id <> neighbor_id
         GROUP BY query_id, neighbor_id),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                               AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
          FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
          GROUP BY vec_id),
scored AS (SELECT query_id, neighbor_id,
                  round(dotp / (nq.nrm * nc.nrm), 9) AS cos_sim
           FROM dots JOIN norms nq ON nq.vec_id = query_id
                     JOIN norms nc ON nc.vec_id = neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored) ranked
WHERE rn <= 5
"""


@query("knn_brute_force_top5", oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
{_COSINE_ORACLE_BODY}
""")
def knn_brute_force_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5: broadcast queries x corpus scan, row-local
    zip_with dot product, windowed top-k (operators.similarity)."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_brute_force(emb, emb.filter(F.col("vec_id") < 10), k=5)


_BUCKET_SQL = " + ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
    for i in range(8))


@query("knn_lsh_bucketed_top5", oracle=f"""
WITH b AS (SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS INT) AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
cand AS (SELECT q.query_id, cb.vec_id AS neighbor_id, cb.embedding AS cv
         FROM b cb JOIN q ON cb.bucket = q.bucket AND cb.vec_id <> q.query_id),
qe AS (SELECT query_id, generate_subscripts(qv, 1) AS p, unnest(qv) AS x FROM q),
ce AS (SELECT query_id, neighbor_id, generate_subscripts(cv, 1) AS p, unnest(cv) AS y
       FROM cand),
dots AS (SELECT ce.query_id, ce.neighbor_id,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                              AS DECIMAL(38,12))) AS DOUBLE) AS dotp
         FROM ce JOIN qe ON ce.p = qe.p AND ce.query_id = qe.query_id
         GROUP BY 1, 2),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                               AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
          FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
          GROUP BY vec_id),
scored AS (SELECT query_id, neighbor_id,
                  round(dotp / (nq.nrm * nc.nrm), 9) AS cos_sim
           FROM dots JOIN norms nq ON nq.vec_id = query_id
                     JOIN norms nc ON nc.vec_id = neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored) ranked
WHERE rn <= 5
""")
def knn_lsh_bucketed_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via sign-bucket LSH: candidates share the query's
    8-bit leading-sign bucket, so each query scans ~1/256 of the corpus
    (operators.similarity.knn_lsh_bucketed)."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_lsh_bucketed(emb, emb.filter(F.col("vec_id") < 10), k=5)


_IVF_ORACLE = """
WITH cents AS (SELECT vec_id AS cell, embedding AS cent FROM embeddings
               WHERE vec_id < 16),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                               AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
          FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
          GROUP BY vec_id),
ve AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
              unnest(embedding) AS x FROM embeddings),
ce AS (SELECT cell, generate_subscripts(cent, 1) AS p, unnest(cent) AS y
       FROM cents),
celldots AS (SELECT vec_id, cell,
                    CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                             AS DECIMAL(38,12))) AS DOUBLE) AS dotp
             FROM ve JOIN ce ON ve.p = ce.p GROUP BY vec_id, cell),
cellsim AS (SELECT cd.vec_id, cd.cell, round(dotp / (nv.nrm * nc.nrm), 9) AS csim
            FROM celldots cd JOIN norms nv ON nv.vec_id = cd.vec_id
                             JOIN norms nc ON nc.vec_id = cd.cell),
ranked AS (SELECT vec_id, cell,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, cell) AS crn
           FROM cellsim),
cassign AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE crn = 1),
qprobe AS (SELECT vec_id AS query_id, cell FROM ranked
           WHERE crn <= 4 AND vec_id < 10),
cand AS (SELECT q.query_id, a.neighbor_id
         FROM qprobe q JOIN cassign a ON a.cell = q.cell
         WHERE a.neighbor_id <> q.query_id),
qe AS (SELECT vec_id AS query_id, generate_subscripts(embedding, 1) AS p,
              unnest(embedding) AS x FROM embeddings WHERE vec_id < 10),
ne2 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
               unnest(embedding) AS y FROM embeddings),
cd AS (SELECT cand.query_id, cand.neighbor_id,
              CAST(SUM(CAST(round(CAST(qe.x AS DOUBLE) * CAST(ne2.y AS DOUBLE), 12)
                       AS DECIMAL(38,12))) AS DOUBLE) AS dotp
       FROM cand JOIN qe ON qe.query_id = cand.query_id
                 JOIN ne2 ON ne2.vec_id = cand.neighbor_id AND ne2.p = qe.p
       GROUP BY 1, 2),
scored AS (SELECT query_id, neighbor_id,
                  round(dotp / (nq.nrm * nn.nrm), 9) AS cos_sim
           FROM cd JOIN norms nq ON nq.vec_id = query_id
                   JOIN norms nn ON nn.vec_id = neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored) r
WHERE rn <= 5
"""


@query("knn_ivf_top5", oracle=_IVF_ORACLE)
def knn_ivf_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate kNN: corpus coarse-quantized to 16 cells (broadcast
    centroids, one assignment pass), queries probe their 4 nearest cells —
    each query scans ~4/16 of the corpus via a cell equi-join instead of a
    full scan (operators.similarity.knn_ivf)."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_ivf(emb, emb.filter(F.col("vec_id") < 10), k=5,
                     n_cells=16, n_probe=4)


# `knn_ivf_trained_top5` (uniform-data trained IVF, rows-only since r6)
# was RETIRED in round 14 (r13 verdict task 4): it was fully superseded by
# its exactly-oracled twins — `knn_ivf_trained_planted_top5` below runs
# the SAME kmeans||+Lloyd training pipeline under an exact closed-form
# oracle, and `knn_ivf_index_top5` exact-checks the serving path — so the
# registry now carries zero rows-only entries.  Recorded in COVERAGE.md
# and PROGRESS.jsonl; determinism of the training remains unit-pinned
# (test_kmeans_parallel_init_deterministic_and_bounded).

# Exact oracle for the TRAINED path via planted clusters: on a corpus of 16
# well-separated clusters (cluster c = vec_id % 16; vector = 10*onehot(c) +
# 0.05*original embedding as deterministic within-cluster jitter), kmeans||
# + 2 Lloyd rounds provably recovers the partition (ANN.md planted-cluster
# regime, recall 1.000) and every query's nearest centroid is its own
# cluster — so the trained IVF's top-5 EQUALS the global brute-force top-5,
# which DuckDB computes exactly.  The oracle never reproduces the training
# (not SQL-expressible); it checks the closed-form ANSWER the training must
# reach, so any semantic drift in kmeans||/Lloyd/probe shows up as a hash
# mismatch.  (The uniform-data twin was retired in r14 — note above.)
_PLANTED_IVF_ORACLE = """
WITH pe0 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
                    CAST(unnest(embedding) AS DOUBLE) AS x0
             FROM embeddings),
pe AS (SELECT vec_id, p,
              CASE WHEN p = (vec_id % 16) + 1 THEN 10.0 ELSE 0.0 END
              + x0 * 0.05 AS x
       FROM pe0),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(38,12)))
                      AS DOUBLE)) AS nrm
          FROM pe GROUP BY vec_id),
dots AS (SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id,
                CAST(SUM(CAST(round(qe.x * ce.x, 12) AS DECIMAL(38,12)))
                     AS DOUBLE) AS dotp
         FROM pe qe JOIN pe ce ON qe.p = ce.p
         WHERE qe.vec_id < 10 AND qe.vec_id <> ce.vec_id
         GROUP BY 1, 2),
scored AS (SELECT query_id, neighbor_id,
                  round(dotp / (nq.nrm * nc.nrm), 9) AS cos_sim
           FROM dots JOIN norms nq ON nq.vec_id = query_id
                     JOIN norms nc ON nc.vec_id = neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored) ranked
WHERE rn <= 5
"""


@query("knn_ivf_trained_planted_top5", oracle=_PLANTED_IVF_ORACLE)
def knn_ivf_trained_planted_top5(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """TRAINED IVF with an EXACT cross-engine oracle: the corpus is the
    planted-cluster transform of the embeddings table (see the oracle
    comment above), the centroids come from the full deterministic
    kmeans|| + Lloyd training pipeline, and the search is the same
    16-cell / 4-probe knn_ivf as the production path.  Because trained
    centroids recover the planted partition exactly, the IVF answer is
    the global brute-force top-5 — closed-form for DuckDB."""
    from localsql_spark.operators.similarity import (kmeans_assign,
                                                     kmeans_parallel_init,
                                                     kmeans_update)

    emb = load(spark, sf_dir)["embeddings"]
    c = (F.col("vec_id") % 16).cast("int")
    planted = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == c, F.lit(10.0)).otherwise(F.lit(0.0))
            + x.cast("double") * F.lit(0.05)).alias("embedding"))
    # NOT persisted (r15 measured-and-reverted): five corpus passes read
    # the interpreted planted transform, but a paired sf0.1 A/B put the
    # persist at 4.56s vs 3.78s without — the cache materialization costs
    # more than the recomputes at bench scale (guide §5: persist only
    # when recompute is the more expensive side).
    cents = kmeans_parallel_init(planted, n_clusters=16)
    for _ in range(2):
        assign = kmeans_assign(planted, cents)
        cents = kmeans_update(planted, assign)
    cents = spark.createDataFrame(cents.collect(), schema=cents.schema)
    return S.knn_ivf(planted, planted.filter(F.col("vec_id") < 10), k=5,
                     n_cells=16, n_probe=4, centroids=cents)


@query("embedding_near_dup", oracle=f"""
WITH b AS (SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS INT) AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b),
c0 AS (SELECT b2.vec_id AS neighbor_id, b2.embedding AS cv, q.query_id AS qid
       FROM b b2 JOIN q ON b2.bucket = q.bucket AND q.query_id < b2.vec_id),
qe AS (SELECT query_id, generate_subscripts(qv, 1) AS p, unnest(qv) AS x FROM q),
ce AS (SELECT qid, neighbor_id, generate_subscripts(cv, 1) AS p, unnest(cv) AS y FROM c0),
dots AS (SELECT qid AS vec_a, neighbor_id AS vec_b,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                              AS DECIMAL(38,12))) AS DOUBLE) AS dotp
         FROM ce JOIN qe ON ce.p = qe.p AND qe.query_id = ce.qid
         GROUP BY 1, 2),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                               AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
          FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
          GROUP BY vec_id)
SELECT vec_a, vec_b, round(dotp / (na.nrm * nb.nrm), 9) AS cos_sim
FROM dots JOIN norms na ON na.vec_id = vec_a
          JOIN norms nb ON nb.vec_id = vec_b
WHERE round(dotp / (na.nrm * nb.nrm), 9) >= 0.9
""")
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.9) with sign-bucket
    blocking (operators.similarity.embedding_near_dup_pairs)."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.embedding_near_dup_pairs(emb, threshold=0.9)


@query("near_dup_threshold_sweep", oracle=f"""
WITH b AS (SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS INT) AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b),
c0 AS (SELECT b2.vec_id AS neighbor_id, b2.embedding AS cv, q.query_id AS qid
       FROM b b2 JOIN q ON b2.bucket = q.bucket AND q.query_id < b2.vec_id),
qe AS (SELECT query_id, generate_subscripts(qv, 1) AS p, unnest(qv) AS x FROM q),
ce AS (SELECT qid, neighbor_id, generate_subscripts(cv, 1) AS p, unnest(cv) AS y FROM c0),
dots AS (SELECT qid AS vec_a, neighbor_id AS vec_b,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                              AS DECIMAL(38,12))) AS DOUBLE) AS dotp
         FROM ce JOIN qe ON ce.p = qe.p AND qe.query_id = ce.qid
         GROUP BY 1, 2),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                               AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
          FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
          GROUP BY vec_id),
cs AS (SELECT round(dotp / (na.nrm * nb.nrm), 9) AS cos_sim
       FROM dots JOIN norms na ON na.vec_id = vec_a
                 JOIN norms nb ON nb.vec_id = vec_b),
per AS (SELECT floor(cos_sim / 0.05) AS band, count(*) AS n_pairs FROM cs
        GROUP BY 1)
SELECT round(band * 0.05, 6) AS band_lo, n_pairs,
       CAST(sum(n_pairs) OVER (ORDER BY band DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_pairs
FROM per
ORDER BY band_lo DESC
""")
def near_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold calibration (operators.similarity.
    near_dup_threshold_sweep): the cosine distribution of every
    LSH-blocked candidate pair, banded at 0.05 with cumulative
    pairs-at-or-above — the curve an operator reads to PICK the near-dup
    threshold (the cliff between duplicate mass and background) instead
    of guessing.  Candidate generation is identical to
    embedding_near_dup (blocked, never all-pairs); the banding groupBy
    is bounded at 2/width rows, so the calibration costs one candidate
    pass at any corpus size."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.near_dup_threshold_sweep(emb, band_width=0.05)


# Shared CTE chain for the corpus-cleaning pipeline: quality gate ->
# exact-dedup keep list -> LSH near-dup drop list.  Used by BOTH the
# clean-corpus result oracle and the per-document decision-audit oracle.
_CLEAN_CTES = f"""quality AS (
  SELECT doc_id, lang, text,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
  WHERE length(text) BETWEEN 50 AND 20000
    AND CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{{}}-]')) AS DOUBLE)
        / length(text) < 0.10
    AND CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        / length(text) < 0.20),
exact_keep AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(t)),
near_pairs AS ({_minhash_pairs_sql('(SELECT doc_id, lang, text FROM quality) qsrc')}),
near_drop AS (SELECT DISTINCT doc_b AS doc_id FROM near_pairs)"""

_CLEAN_CORPUS_ORACLE = f"""
WITH {_CLEAN_CTES}
SELECT q.doc_id, q.lang, CAST(length(q.text) AS BIGINT) AS n_chars
FROM quality q
JOIN exact_keep k ON k.doc_id = q.doc_id
LEFT JOIN near_drop d ON d.doc_id = q.doc_id
WHERE d.doc_id IS NULL
"""


def _clean_corpus_parts(spark: SparkSession, sf_dir: str):
    """Shared stages of the corpus-cleaning pipeline: (docs, quality,
    exact_keep, near_drop) — the quality-gated corpus is persisted once
    because it feeds THREE stages (exact keep-list, LSH near-dup, final
    projection); on a real pipeline this is the staged write of the
    filtered corpus between jobs.  spread() runs BEFORE the persist: a
    cache freezes the partition layout, and caching a single-split local
    scan would pin every downstream stage (the LSH signature fold above
    all) to one core."""
    from localsql_spark.operators import track_persist

    docs = load(spark, sf_dir)["documents"]
    quality = track_persist(spread(docs).filter(
        F.length("text").between(50, 20000)
        & (T.punct_ratio(F.col("text")) < 0.10)
        & (T.digit_ratio(F.col("text")) < 0.20)))
    exact_keep = (quality
                  .groupBy(T.fingerprint_md5(F.col("text")).alias("h"))
                  .agg(F.min("doc_id").alias("doc_id"))
                  .select("doc_id"))
    # bucket_cap = the production posture: exact dedup (previous stage)
    # already collapsed verbatim copies, so any over-cap LSH bucket left is
    # mass near-identical boilerplate whose pairs would blow up
    # quadratically.  The testdata never fills a bucket past 64, so the
    # oracle (which has no cap) stays value-identical at every test SF;
    # capping behavior itself is pinned by the operator unit test.
    near_drop = (D.minhash_lsh_pairs(quality, threshold=0.5, bucket_cap=64)
                 .select(F.col("doc_b").alias("doc_id")).distinct())
    return docs, quality, exact_keep, near_drop


@query("pipeline_clean_corpus", oracle=_CLEAN_CORPUS_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning: quality gate (length/punct/digit
    ratios) -> exact dedup (keep lowest doc_id per content hash) -> MinHash
    near-dup removal (drop the higher id of every confirmed pair). Composes
    the individual operators; plan = row-local filters + one hash-dedup
    shuffle + the linear LSH self-join + two anti/semi joins."""
    docs, quality, exact_keep, near_drop = _clean_corpus_parts(spark, sf_dir)
    return (quality
            .join(exact_keep, "doc_id", "left_semi")
            .join(near_drop, "doc_id", "left_anti")
            .select("doc_id", "lang",
                    F.length("text").cast("long").alias("n_chars")))


@query("pipeline_dedup_decisions", oracle=f"""
WITH {_CLEAN_CTES}
SELECT d.doc_id,
       CASE WHEN q.doc_id IS NULL THEN 'dropped_quality'
            WHEN k.doc_id IS NULL THEN 'dropped_exact'
            WHEN nd.doc_id IS NOT NULL THEN 'dropped_near'
            ELSE 'kept' END AS decision
FROM documents d
LEFT JOIN quality q ON q.doc_id = d.doc_id
LEFT JOIN exact_keep k ON k.doc_id = d.doc_id
LEFT JOIN near_drop nd ON nd.doc_id = d.doc_id
""")
def pipeline_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document decision audit for the cleaning pipeline: EVERY input
    doc labeled kept / dropped_quality / dropped_exact / dropped_near —
    the explainability artifact a production curation run ships next to
    the cleaned corpus (spot-check drops, quantify stage attrition,
    reproduce any document's fate).  Same staged plan as
    pipeline_clean_corpus (shared quality cache) plus three left joins on
    doc_id; the labels are mutually exclusive by stage order, mirrored
    exactly in the oracle's CASE."""
    docs, quality, exact_keep, near_drop = _clean_corpus_parts(spark, sf_dir)
    q = quality.select("doc_id", F.lit(True).alias("in_q"))
    k = exact_keep.select("doc_id", F.lit(True).alias("in_k"))
    nd = near_drop.select("doc_id", F.lit(True).alias("in_nd"))
    return (docs.select("doc_id")
            .join(q, "doc_id", "left")
            .join(k, "doc_id", "left")
            .join(nd, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("in_q").isNull(), "dropped_quality")
                .when(F.col("in_k").isNull(), "dropped_exact")
                .when(F.col("in_nd").isNotNull(), "dropped_near")
                .otherwise("kept").alias("decision")))


@query("sample_documents_hashmod", oracle="""
SELECT doc_id, lang,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10
         AS bucket
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10
      < CASE WHEN lang = 'en' THEN 5 ELSE 2 END
""")
def sample_documents_hashmod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by hash-mod bucket (50% of 'en',
    20% otherwise) — the reproducible sampling a training pipeline needs
    (same rows on every run/cluster, no rand()); row-local filter, fully
    pushdown-friendly, zero shuffles."""
    docs = load(spark, sf_dir)["documents"]
    from localsql_spark.operators import hash32
    bucket = hash32(F.col("doc_id")) % 10
    rate = F.when(F.col("lang") == "en", 5).otherwise(2)
    return (docs.filter(bucket < rate)
            .select("doc_id", "lang", bucket.alias("bucket")))


_SIMHASH_CTE = r"""
norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
         FROM documents),
tok AS (SELECT DISTINCT doc_id, tk
        FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM norm)),
h AS (SELECT doc_id, CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) AS h FROM tok),
votes AS (SELECT doc_id, i,
                 sum(CASE WHEN (h & (CAST(1 AS BIGINT) << i)) <> 0
                          THEN 1 ELSE -1 END) AS v
          FROM h CROSS JOIN UNNEST(range(32)) u(i)
          GROUP BY doc_id, i),
sh AS (SELECT doc_id,
              CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
                            ELSE 0 END) AS BIGINT) AS simhash
       FROM votes GROUP BY doc_id)
"""


@query("dedup_simhash_pairs", oracle=f"""
WITH {_SIMHASH_CTE},
bands AS (SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS byte
          FROM sh CROSS JOIN UNNEST(range(4)) u2(b)),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                x.simhash AS ha, y.simhash AS hb
         FROM bands x JOIN bands y
           ON x.b = y.b AND x.byte = y.byte AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, bit_count(xor(ha, hb)) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
""")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: byte-band LSH on the 32-bit hash (any pair
    with hamming <= 3 shares at least one of 4 bytes, pigeonhole) -> linear
    candidate join -> exact popcount filter. Same banded-join shape as
    MinHash-LSH but on a 1-word signature — the cheap first-pass near-dup
    detector at scale."""
    docs = load(spark, sf_dir)["documents"]
    return D.simhash_near_pairs(docs, "text", "doc_id", max_hamming=3)


@query("text_bm25_scores", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'hash', 'vector') GROUP BY 1, 2),
idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id,
       CAST(round(SUM(CAST(round(
         ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
         * tf * 2.2
         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 12) AS DECIMAL(28,12))), 9) AS DOUBLE) AS score
FROM tf JOIN idf USING (term) JOIN doclen USING (doc_id) CROSS JOIN stats
GROUP BY tf.doc_id
""")
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring against a query bag ('join hash vector') via an
    inverted index: explode -> tf/df aggregates -> broadcast tiny stats —
    the topic-filtering scorer for corpus curation
    (operators.text.bm25_scores)."""
    docs = load(spark, sf_dir)["documents"]
    return T.bm25_scores(docs, ["join", "hash", "vector"])


@query("dedup_clusters", oracle=f"""
WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT reach.n, edges.t FROM reach JOIN edges ON edges.s = reach.r
)
SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n
""")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair list -> duplicate CLUSTERS: min-label-propagation
    connected components (converges in diameter rounds, one join+groupBy
    each, fully distributed) over the MinHash-LSH pairs; cluster id = min
    doc_id, i.e. the canonical survivor
    (operators.dedup.connected_components)."""
    docs = load(spark, sf_dir)["documents"]
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    cc = D.connected_components(pairs, base=docs)
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")


@query("embedding_int8_quantize", oracle="""
WITH mx AS (SELECT vec_id, label,
                   greatest(list_aggregate(list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE))), 'max'), 1e-12)
                     AS scale
            FROM embeddings)
SELECT e.vec_id, e.label,
       round(mx.scale, 9) AS scale,
       array_to_string(list_transform(e.embedding,
           x -> CAST(round(CAST(x AS DOUBLE) / mx.scale * 127, 0) AS INT))
         [1:8], ',') AS q8_head,
       CAST(list_aggregate(list_transform(e.embedding,
           x -> abs(CAST(round(CAST(x AS DOUBLE) / mx.scale * 127, 0) AS INT))),
           'max') AS INT) AS q8_absmax
FROM embeddings e JOIN mx ON e.vec_id = mx.vec_id
""")
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization (scale = max |x|): the
    embedding-compression step before similarity indexing at scale —
    row-local transform, zero shuffles; emits the first 8 quantized values
    + the abs-max as compact checkable projections."""
    emb = load(spark, sf_dir)["embeddings"]
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.greatest(
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))),
        F.lit(1e-12))
    q = F.transform("embedding",
                    lambda x: F.round(xd(x) / F.col("scale") * 127, 0)
                    .cast("int"))
    # output aliases don't affect input resolution within the select, so
    # the rounded scale can take the name directly
    return (emb.withColumn("scale", scale)
            .select("vec_id", "label",
                    F.round("scale", 9).alias("scale"),
                    F.concat_ws(",", F.transform(
                        F.slice(q, 1, 8),
                        lambda v: v.cast("string"))).alias("q8_head"),
                    F.array_max(F.transform(q, F.abs)).alias("q8_absmax")))


@query("pack_documents_2048", oracle=r"""
WITH t AS (SELECT doc_id, lang,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                    AS n_tok
           FROM documents),
c AS (SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT doc_id, lang, n_tok,
       CAST(floor((cum - 1) / 2048) AS BIGINT) AS pack_id
FROM c
""")
def pack_documents_2048(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents (per language, in a
    deterministic order) to fixed 2048-token packs via a running token sum —
    the greedy contiguous packing used to fill context windows. One window
    shuffle on the packing key; at scale the key includes a shard id so no
    single partition orders the whole corpus."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir)["documents"]
    n_tok = T.token_count_ws(F.col("text"))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs.select("doc_id", "lang", n_tok.alias("n_tok"))
            .withColumn("cum", F.sum("n_tok").over(w))
            .select("doc_id", "lang", "n_tok",
                    F.floor((F.col("cum") - 1) / 2048).cast("long")
                    .alias("pack_id")))


_DECON_EXACT_ORACLE = f"""
WITH {_shingles_cte()},
eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0),
hits AS (SELECT doc_id, count(*) AS n_shared
         FROM (SELECT DISTINCT train.doc_id, train.s
               FROM train JOIN eval_sh ON train.s = eval_sh.s) h
         GROUP BY doc_id)
SELECT d.doc_id, COALESCE(hits.n_shared, 0) AS n_shared,
       (hits.doc_id IS NOT NULL) AS contaminated
FROM (SELECT DISTINCT doc_id FROM train) d
LEFT JOIN hits ON d.doc_id = hits.doc_id
"""


@query("decontaminate_training_set", oracle=_DECON_EXACT_ORACLE)
def decontaminate_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ANY 3-word
    shingle with a held-out eval set (doc_id % 50 == 0 here). Inverted-index
    semi-join on the shingle (operators.selection.decontaminate_exact) —
    the standard n-gram overlap check run before training; the eval
    shingle set stays distributed (no broadcast: eval sets can be
    large)."""
    from localsql_spark.operators.selection import decontaminate_exact

    docs = load(spark, sf_dir)["documents"]
    return decontaminate_exact(docs)


@query("decontaminate_bloom", oracle=_DECON_EXACT_ORACLE)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination — the shape the exact
    check takes at 100 TB.  decontaminate_training_set's semi-join
    shuffles EVERY training shingle on the shingle key; here the eval
    set's shingles compress into a portable Bloom bit table
    (operators.sketches.bloom_build — <= min(K*n, m) rows, broadcastable
    at any corpus scale), train shingles prefilter against it as K
    successive broadcast-hash joins — one per hash function, so the
    streaming train side is NEVER shuffled and ~97% of its mass drops at
    the first map-side join — and only the tiny surviving candidate set
    pays the exact verification join that removes the filter's false
    positives.  m = 2^22 keeps the FP rate ~1e-6 at this eval size, so
    the verify join is output-sized.  Sharing the exact oracle proves
    bloom-prefilter + exact-verify == the plain inverted-index join —
    false positives verified away, no false negatives by construction
    (operators.selection.decontaminate_bloom)."""
    from localsql_spark.operators.selection import \
        decontaminate_bloom as _decon_bloom

    docs = load(spark, sf_dir)["documents"]
    return _decon_bloom(docs)


@query("text_bpe_token_count", oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text),
         '(?:''s|''t|''re|''ve|''m|''ll|''d)|( ?[a-z]+)|( ?[0-9]+)|( ?[^\s a-z0-9]+)'))
         AS BIGINT) AS bpe_tokens,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens
FROM documents
""")
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenizer count (GPT-2-shaped pattern: contraction
    suffixes, space-prefixed letter/digit/punct runs) next to the whitespace
    count — the cheap token-budget estimator before real BPE; row-local
    regex, zero shuffles."""
    docs = load(spark, sf_dir)["documents"]
    pat = r"(?:'s|'t|'re|'ve|'m|'ll|'d)| ?[a-z]+| ?[0-9]+| ?[^\s a-z0-9]+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(pat), F.lit(0)))
         .cast("long").alias("bpe_tokens"),
        T.token_count_ws(F.col("text")).alias("ws_tokens"))


@query("mix_sources_weighted", oracle="""
SELECT doc_id, source,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
         % 100 AS bucket
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
      < CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 80
             WHEN CAST(substr(source, 4) AS INT) < 10 THEN 50
             ELSE 20 END
""")
def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: per-source sampling rates (src0-4: 80%,
    src5-9: 50%, rest: 20%) via the deterministic hash-mod bucket — the
    mixture-weights step of corpus assembly; reproducible across runs and
    engines, pushdown-friendly, zero shuffles."""
    docs = load(spark, sf_dir)["documents"]
    from localsql_spark.operators import hash32
    bucket = hash32(F.col("doc_id")) % 100
    src_id = F.substring("source", 4, 10).cast("int")
    rate = F.when(src_id < 5, 80).when(src_id < 10, 50).otherwise(20)
    return (docs.filter(bucket < rate)
            .select("doc_id", "source", bucket.alias("bucket")))


@query("text_tfidf_top_terms", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (SELECT doc_id, term,
                  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 9) AS tfidf
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
ranked AS (SELECT doc_id, term, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term ASC) AS rk
           FROM scored)
SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= 3
""")
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tf groupBy (one shuffle on
    (doc, term)), document frequency as COUNT OVER (PARTITION BY term) — a
    window on the already-aggregated tf rows, NOT a second aggregation of
    the token subtree (a groupBy+re-join formulation makes Catalyst compute
    the tokenize+tf pipeline twice; the window shares it) — idf = ln(N/df),
    then a per-doc ranking window.  Rank ties break on the term itself so
    the result is deterministic.  N comes from a scalar agg that Catalyst
    broadcasts as a one-row cross — never a driver collect."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir)["documents"]
    toks = (spread(docs)
            .select("doc_id",
                    F.explode(F.split(T.normalize_text(F.col("text")), " "))
                    .alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.withColumn("df", F.count(F.lit(1))
                            .over(Window.partitionBy("term")))
              .crossJoin(F.broadcast(n_docs))
              .select("doc_id", "term",
                      F.round(F.col("tf")
                              * F.log(F.col("n_docs").cast("double")
                                      / F.col("df")), 9).alias("tfidf")))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("tfidf").desc(), F.col("term").asc()))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("doc_id", "term", "tfidf", F.col("rk").cast("long").alias("rk")))


@query("dedup_levenshtein_pairs", oracle="""
WITH blocked AS (SELECT doc_id, lang, n_chars // 32 AS lb,
                        substr(text, 1, 64) AS head
                 FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
FROM blocked a JOIN blocked b
  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 12
""")
def dedup_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs with (lang, length-bucket) blocking.

    levenshtein is O(len^2) PER PAIR, so at scale the join must never go
    quadratic in the corpus: candidates are restricted to the same language
    and the same 32-char length bucket (docs differing wildly in length
    can't be near-dups), and the distance runs over a fixed 64-char head so
    per-pair cost is bounded.  Blocking is an approximation by design —
    pairs straddling a bucket boundary are missed (standard
    sorted-neighborhood tradeoff; the oracle encodes the same blocking).
    """
    docs = load(spark, sf_dir)["documents"]
    blocked = (spread(docs)
               .select("doc_id", "lang",
                       (F.col("n_chars") / 32).cast("long").alias("lb"),
                       F.substring("text", 1, 64).alias("head")))
    a = blocked.select(F.col("doc_id").alias("doc_a"), "lang", "lb",
                       F.col("head").alias("head_a"))
    b = blocked.select(F.col("doc_id").alias("doc_b"), "lang", "lb",
                       F.col("head").alias("head_b"))
    dist = F.levenshtein("head_a", "head_b")
    return (a.join(b, ["lang", "lb"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(dist <= 12)
            .select("doc_a", "doc_b", dist.cast("long").alias("edit_dist")))


@query("events_funnel_conversion", oracle="""
WITH v AS (SELECT user_id, min(ts) AS vts FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS cts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS pts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY 1)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase
""")
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase) conversion counts in ONE
    scan + ONE shuffle: three whole-partition window minima over the same
    user_id partitioning (each step's cutoff references the previous
    step's — Catalyst reuses the single exchange across the window passes),
    then a per-user collapse and a scalar count.  A staged
    groupBy-join-groupBy formulation re-scans and re-shuffles the events
    table once per funnel step.  The sequence constraint is event-TIME
    ordering (strictly later than the previous step's first occurrence)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    w = Window.partitionBy("user_id")
    fv = ev.withColumn(
        "fv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
    fc = fv.withColumn(
        "fc", F.min(F.when((F.col("event_type") == "click")
                           & (F.col("ts") > F.col("fv")), F.col("ts"))).over(w))
    fp = fc.withColumn(
        "fp", F.min(F.when((F.col("event_type") == "purchase")
                           & (F.col("ts") > F.col("fc")), F.col("ts"))).over(w))
    per_user = fp.groupBy("user_id").agg(
        F.max("fv").alias("fv"), F.max("fc").alias("fc"),
        F.max("fp").alias("fp"))
    return per_user.agg(
        F.count("fv").alias("n_view"),
        F.count("fc").alias("n_view_click"),
        F.count("fp").alias("n_view_click_purchase"))


@query("sketch_countmin_terms", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT unnest(string_split(t, ' ')) AS term FROM norm),
buckets AS (SELECT d,
                   CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || term), 1, 8)
                        AS BIGINT) % 128 AS bucket,
                   count(*) AS cnt
            FROM toks CROSS JOIN UNNEST(range(2)) u(d)
            GROUP BY 1, 2),
probes AS (SELECT unnest(['the', 'data', 'query', 'spark']) AS term),
probe_buckets AS (SELECT term, d,
                         CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || term), 1, 8)
                              AS BIGINT) % 128 AS bucket
                  FROM probes CROSS JOIN UNNEST(range(2)) u(d)),
exact AS (SELECT p.term, count(t.term) AS exact_count
          FROM probes p LEFT JOIN toks t ON t.term = p.term GROUP BY 1)
SELECT pb.term,
       min(b.cnt) AS est_count,
       min(e.exact_count) AS exact_count
FROM probe_buckets pb
JOIN buckets b ON b.d = pb.d AND b.bucket = pb.bucket
JOIN exact e ON e.term = pb.term
GROUP BY pb.term
""")
def sketch_countmin_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch term frequencies: depth 2 x width 128 counter table
    built with ONE groupBy over (row, md5-bucket) — the sketch is
    fixed-size (256 rows) no matter how large the corpus, which is the
    whole point at 100 TB: frequency estimates with bounded memory and a
    mergeable structure (counter tables from different partitions/days sum
    cell-wise).  Estimates are min-over-rows and only ever OVERestimate
    (collisions add); the exact counts ride along to exhibit the bound.
    md5-derived bucket hashes keep the sketch bit-identical on DuckDB."""
    docs = load(spark, sf_dir)["documents"]
    toks = (spread(docs)
            .select(F.explode(F.split(T.normalize_text(F.col("text")), " "))
                    .alias("term")))
    depths = F.array(*[F.lit(d) for d in range(2)])

    from localsql_spark.operators import hash32

    def bucket(d: Column, term: Column) -> Column:
        return hash32(F.concat(d.cast("string"), F.lit("|"), term)) % 128

    counters = (toks.select(F.explode(depths).alias("d"), "term")
                .select("d", bucket(F.col("d"), F.col("term")).alias("bucket"))
                .groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt")))
    probe_terms = ["the", "data", "query", "spark"]
    probes = spark.createDataFrame([(t,) for t in probe_terms], "term string")
    probe_buckets = (probes.select("term", F.explode(depths).alias("d"))
                     .select("term", "d",
                             bucket(F.col("d"), F.col("term")).alias("bucket")))
    tok2 = toks.select(F.col("term").alias("t2"))
    exact = (probes.join(tok2, probes.term == tok2.t2, "left")
             .groupBy("term")
             .agg(F.count("t2").alias("exact_count")))
    return (probe_buckets
            .join(F.broadcast(counters), ["d", "bucket"])
            .groupBy("term").agg(F.min("cnt").alias("est_count"))
            .join(exact, "term")
            .select("term", "est_count", "exact_count"))


@query("dedup_clusters_bigstar", oracle=f"""
WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT reach.n, edges.t FROM reach JOIN edges ON edges.s = reach.r
)
SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n
""")
def dedup_clusters_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via alternating large-star/small-star contraction
    (operators.dedup.connected_components_bigstar): identical result to
    dedup_clusters (same oracle), but convergence is O(log^2 n) rounds
    independent of component DIAMETER — the variant that survives
    pathological near-dup chains at 100 TB where min-label propagation
    needs one round per hop."""
    docs = load(spark, sf_dir)["documents"]
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    cc = D.connected_components_bigstar(pairs, base=docs)
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")


# ---------------------------------------------------------------------------
# PII redaction / repetition signals / train-val-test split
# ---------------------------------------------------------------------------

# The synthetic corpus carries no real PII, so the query first APPENDS a
# deterministic doc_id-derived contact line (same expression on both
# engines), then counts and redacts it — exercising the regex machinery
# with a non-trivial effect while staying oracle-checkable.
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com tel +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 250 AS VARCHAR)")

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
_PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@query("text_pii_redact", oracle=f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(t, '{_PII_IPV4}')) AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IPV4}', '<IPV4>', 'g')) AS redacted_md5,
       length(regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IPV4}', '<IPV4>', 'g')) AS redacted_len
FROM aug
""")
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / phones / IPv4) for training-data hygiene:
    per-doc occurrence counts + the redacted text (surfaced as md5+length
    so the gate checks the exact output string without hashing megabytes).
    Pure row-local regexp expressions — RE2-compatible patterns shared
    verbatim with the oracle, zero shuffle, linear scan at 100 TB.  The
    double reference to the redacted chain (md5 + length) is safe: codegen
    subexpression elimination shares it WITHIN this projection (measured —
    unlike lambda-internal references, which it cannot share)."""
    docs = spread(load(spark, sf_dir)["documents"])
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@mail.example.com tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 250).cast("string"))
    d = docs.select("doc_id", aug.alias("t"))
    red = T.pii_redact(F.col("t"))
    return d.select(
        "doc_id",
        T.pii_count(F.col("t"), "email").alias("n_email"),
        T.pii_count(F.col("t"), "phone").alias("n_phone"),
        T.pii_count(F.col("t"), "ipv4").alias("n_ipv4"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"))


@query("text_repetition_signals", oracle=r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents),
grams AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(len(toks) - 1),
                                  i -> concat_ws(' ', toks[i+1], toks[i+2]))
              ELSE [] END AS bg
  FROM norm)
SELECT doc_id,
       len(toks) AS n_words,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         AS distinct_ratio,
       CAST(list_max(list_transform(list_distinct(toks),
              d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
         / len(toks) AS top_word_frac,
       CASE WHEN len(bg) > 0
            THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
            ELSE 0.0 END AS dup_bigram_frac
FROM grams
""")
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: distinct-word ratio, top-word
    fraction, duplicate-bigram fraction.  All three are ROW-LOCAL lambda
    folds over the token array (no explode, no shuffle): the two-shuffle
    explode+groupBy formulation is strictly worse at 100 TB for crawl-bounded
    document lengths.  Ratios are one double division of exact ints."""
    docs = spread(load(spark, sf_dir)["documents"])
    return docs.select(
        "doc_id",
        F.size(T._words(F.col("text"))).alias("n_words"),
        T.distinct_word_ratio(F.col("text")).alias("distinct_ratio"),
        T.top_word_fraction(F.col("text")).alias("top_word_frac"),
        T.dup_ngram_fraction(F.col("text"), 2).alias("dup_bigram_frac"))


@query("split_train_val_test", oracle="""
WITH b AS (
  SELECT source, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 100 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1, 2
""")
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by portable hash-mod —
    membership is a pure function of doc_id (stable across runs, clusters,
    and engines; no rand()).  The verification aggregates per split×source.
    Row-local bucket assignment + one partial-aggregated shuffle."""
    from localsql_spark.operators import hash32
    docs = load(spark, sf_dir)["documents"]
    bucket = hash32(F.col("doc_id")) % 100
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    return (docs.select(split.alias("split"), "source", "n_chars")
            .groupBy("split", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars")))


_BLOOM_POS_SQL = ("CAST('0x' || substr(md5(CAST(KEY AS VARCHAR)), 1 + 8*j, 8)"
                  " AS BIGINT) % 65536")


@query("sketch_bloom_membership", oracle=f"""
WITH bits AS (
  SELECT DISTINCT {_BLOOM_POS_SQL.replace("KEY", "c_custkey")} AS bit
  FROM customer CROSS JOIN UNNEST([0, 1, 2, 3]) u(j)),
probes AS (SELECT DISTINCT o_orderkey AS k FROM orders),
ph AS (
  SELECT k, {_BLOOM_POS_SQL.replace("KEY", "k")} AS bit
  FROM probes CROSS JOIN UNNEST([0, 1, 2, 3]) u(j)),
maybe AS (
  SELECT k FROM ph JOIN bits USING (bit) GROUP BY k HAVING count(*) = 4),
truth AS (
  SELECT DISTINCT p.k FROM probes p JOIN customer c ON p.k = c.c_custkey)
SELECT CAST((SELECT count(*) FROM probes) AS BIGINT) AS n_probes,
       CAST((SELECT count(*) FROM maybe) AS BIGINT) AS n_maybe,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM maybe m LEFT JOIN truth t ON m.k = t.k
             WHERE t.k IS NULL) AS BIGINT) AS n_false_pos
""")
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter: build over customer keys, probe with order
    keys (a mostly-disjoint domain), and report maybe/true/false-positive
    counts.  The audit joins probe results against exact membership, so the
    gate verifies the filter's no-false-negative guarantee AND the exact
    false-positive set of this hash family.  Scale shape: bit table <= 64Ki
    rows (broadcast), probes stay distributed; Spark's JVM-internal
    ``stat.bloomFilter`` is the non-portable production alternative."""
    from localsql_spark.operators import sketches as SK
    from localsql_spark.operators import track_persist
    t = load(spark, sf_dir)
    bits = SK.bloom_build(t["customer"], "c_custkey")
    # persisted: referenced by the probe pass AND as the audit's base frame —
    # without the persist each reference re-runs the orders scan + distinct
    probes = track_persist(
        t["orders"].select(F.col("o_orderkey").alias("k")).distinct())
    maybe = (SK.bloom_probe(bits, probes, "k")
             .withColumn("is_maybe", F.lit(1)))
    members = (t["customer"]  # c_custkey is unique: no distinct needed
               .select(F.col("c_custkey").alias("k"), F.lit(1).alias("is_member")))
    # ONE aggregate over flag-joined probes instead of four cross-joined
    # single-row counts (which re-derived the whole probe subtree per count:
    # 38 static exchanges -> a handful)
    return (probes.join(maybe, "k", "left").join(members, "k", "left")
            .agg(F.count(F.lit(1)).alias("n_probes"),
                 F.sum(F.coalesce("is_maybe", F.lit(0))).alias("n_maybe"),
                 F.sum(F.coalesce("is_member", F.lit(0))).alias("n_true"),
                 F.sum(((F.col("is_maybe") == 1) & F.col("is_member").isNull())
                       .cast("int")).alias("n_false_pos")))


_KM_DIST = ("CAST(SUM(CAST(round((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y), 12)"
            " AS DECIMAL(28,12))) AS DOUBLE)")

_KMEANS_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cell,
         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS cent
  FROM embeddings WHERE vec_id < 8),
ve AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
              unnest(embedding) AS x FROM embeddings),
ce0 AS (SELECT cell, generate_subscripts(cent, 1) AS p, unnest(cent) AS y
        FROM seeds),
d0 AS (SELECT vec_id, cell, {_KM_DIST} AS dist
       FROM ve JOIN ce0 USING (p) GROUP BY vec_id, cell),
a0 AS (SELECT vec_id, cell FROM (
         SELECT vec_id, cell,
                ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cell) AS rn
         FROM d0) r WHERE rn = 1),
ce1 AS (SELECT a0.cell, ve.p,
               CAST(SUM(CAST(round(CAST(ve.x AS DOUBLE), 12)
                             AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS y
        FROM ve JOIN a0 USING (vec_id) GROUP BY a0.cell, ve.p),
d1 AS (SELECT vec_id, cell, {_KM_DIST} AS dist
       FROM ve JOIN ce1 USING (p) GROUP BY vec_id, cell)
SELECT vec_id, cell AS cluster_id, round(dist, 9) AS dist FROM (
  SELECT vec_id, cell, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
  FROM d1) r WHERE rn = 1
"""


_OUTLIER_ORACLE = f"""
WITH asg AS ({_KMEANS_ORACLE}),
st AS (SELECT cluster_id,
              CAST(SUM(CAST(round(dist, 12) AS DECIMAL(38,12))) AS DOUBLE)
                / COUNT(*) AS mu,
              CAST(SUM(CAST(round(dist * dist, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) / COUNT(*) AS m2
       FROM asg GROUP BY 1)
SELECT vec_id, cluster_id, dist,
       round(CASE WHEN sqrt(greatest(m2 - mu * mu, 0.0)) > 0
                  THEN (dist - mu) / sqrt(greatest(m2 - mu * mu, 0.0))
             END, 6) AS z,
       coalesce(CASE WHEN sqrt(greatest(m2 - mu * mu, 0.0)) > 0
                     THEN (dist - mu) / sqrt(greatest(m2 - mu * mu, 0.0))
                END > 2.0, false) AS is_outlier
FROM asg JOIN st USING (cluster_id)
"""


@query("embedding_outliers_z2", oracle=_OUTLIER_ORACLE)
def embedding_outliers_z2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier gate (operators.similarity.
    embedding_outliers): per-cluster z-score of each vector's distance to
    its own centroid (one Lloyd round from deterministic seeds), flagging
    z > 2 — the cheap screen for mis-embedded/corrupt/off-manifold rows
    before they pollute dedup or mixing decisions.  The stats layer uses
    the decimal-sum discipline, so the oracle replays assignment, update,
    re-assignment AND the moment computation bit-for-bit."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.embedding_outliers(emb, n_clusters=8, n_iter=1,
                                z_threshold=2.0)


@query("embedding_kmeans_clusters", oracle=_KMEANS_ORACLE)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding space (one full Lloyd round from
    deterministic seeds): the embedding-curation workhorse — SemDeDup-style
    cluster-then-filter, cluster-balanced mixing, coverage analysis all
    start from this assignment.  Assignment is a broadcast of k centroids +
    row-local decimal-fold distances; the update is a narrow
    (cluster, dim, x) aggregate (operators.similarity.kmeans_lloyd).  The
    oracle replays both phases exactly, so the gate checks the true
    two-phase computation."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.kmeans_lloyd(emb, n_clusters=8, n_iter=1)


# Per-subspace squared-L2 with the shared decimal discipline (the PQ analog
# of _KM_DIST; sv/c alias pair bound at use site)
_PQ_DIST = ("CAST(SUM(CAST(round((CAST(sv.x AS DOUBLE) - cb.y)"
            " * (CAST(sv.x AS DOUBLE) - cb.y), 12)"
            " AS DECIMAL(28,12))) AS DOUBLE)")

_PQ_ORACLE = f"""
WITH sub AS (
  SELECT vec_id, s,
         list_transform(list_slice(embedding, s * 16 + 1, s * 16 + 16),
                        e -> CAST(e AS DOUBLE)) AS v
  FROM embeddings, UNNEST(range(4)) u(s)),
sv AS (SELECT vec_id, s, generate_subscripts(v, 1) AS p, unnest(v) AS x
       FROM sub),
seeds AS (SELECT s, vec_id AS code, v AS cent FROM sub WHERE vec_id < 16),
cv0 AS (SELECT s, code, generate_subscripts(cent, 1) AS p, unnest(cent) AS y
        FROM seeds),
d0 AS (SELECT sv.vec_id, sv.s, cb.code, {_PQ_DIST} AS dist
       FROM sv JOIN cv0 cb ON sv.s = cb.s AND sv.p = cb.p
       GROUP BY sv.vec_id, sv.s, cb.code),
a0 AS (SELECT vec_id, s, code FROM (
         SELECT vec_id, s, code,
                ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY dist, code) AS rn
         FROM d0) r WHERE rn = 1),
c1 AS (SELECT a0.s, a0.code, sv.p,
              CAST(SUM(CAST(round(CAST(sv.x AS DOUBLE), 12)
                            AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS y
       FROM sv JOIN a0 ON sv.vec_id = a0.vec_id AND sv.s = a0.s
       GROUP BY a0.s, a0.code, sv.p),
d1 AS (SELECT sv.vec_id, sv.s, cb.code, {_PQ_DIST} AS dist
       FROM sv JOIN c1 cb ON sv.s = cb.s AND sv.p = cb.p
       GROUP BY sv.vec_id, sv.s, cb.code),
codes AS (SELECT vec_id, s, code FROM (
            SELECT vec_id, s, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, code) AS rn
            FROM d1) r WHERE rn = 1),
scored AS (SELECT l.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(CAST(SUM(CAST(round(l.dist, 12) AS DECIMAL(28,12)))
                             AS DOUBLE), 9) AS adc_dist
           FROM codes c JOIN d1 l ON l.s = c.s AND l.code = c.code
           WHERE l.vec_id < 10 AND l.vec_id <> c.vec_id
           GROUP BY 1, 2)
SELECT query_id, neighbor_id, adc_dist, rn FROM (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rn
  FROM scored) r WHERE rn <= 5
"""


@query("knn_pq_top5", oracle=_PQ_ORACLE)
def knn_pq_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators.similarity.knn_pq_adc, Jégou et
    al. TPAMI 2011): per-subspace k-means codebooks (m=4, 16 codes, one
    Lloyd round from deterministic seeds), corpus encoded to 4 small ints
    per vector (64x smaller than the float rows), queries scored by
    asymmetric-distance lookup-table sums — the memory-bounded ANN path
    for corpora whose float vectors no longer fit the cluster.  The
    oracle replays training, encoding, and ADC scoring in SQL, so the
    gate checks the full pipeline, not just the final ranks."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_pq_adc(emb, emb.filter(F.col("vec_id") < 10), k=5,
                        m=4, k_codes=16, n_iter=1, exclude_self=True)


_PQ_RERANK_ORACLE = _PQ_ORACLE[:_PQ_ORACLE.rindex(
    "SELECT query_id, neighbor_id, adc_dist, rn")] + """,
short AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rn
  FROM scored) r WHERE rn <= 20),
qe AS (SELECT vec_id AS query_id, generate_subscripts(embedding, 1) AS p,
              unnest(embedding) AS x
       FROM embeddings WHERE vec_id < 10),
ce AS (SELECT sh.query_id, sh.neighbor_id,
              generate_subscripts(e.embedding, 1) AS p,
              unnest(e.embedding) AS y
       FROM short sh JOIN embeddings e ON e.vec_id = sh.neighbor_id),
dots AS (SELECT ce.query_id, ce.neighbor_id,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                              AS DECIMAL(38,12))) AS DOUBLE) AS dotp
         FROM ce JOIN qe ON ce.p = qe.p AND ce.query_id = qe.query_id
         GROUP BY 1, 2),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE)
                                          * CAST(x AS DOUBLE), 12)
                               AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
          FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
          GROUP BY vec_id),
rescored AS (SELECT d.query_id, d.neighbor_id,
                    round(dotp / (nq.nrm * nc.nrm), 9) AS cos_sim
             FROM dots d JOIN norms nq ON nq.vec_id = d.query_id
                         JOIN norms nc ON nc.vec_id = d.neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM rescored) r WHERE rn <= 5
"""


@query("knn_pq_rerank_top5", oracle=_PQ_RERANK_ORACLE)
def knn_pq_rerank_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC shortlist (20) + exact cosine re-rank to top-5
    (operators.similarity.knn_pq_rerank) — the production ANN pattern:
    quantized codes pick candidates without touching float vectors, then
    exactly |queries| x 20 vectors are fetched through a broadcast join
    for the true metric.  The oracle replays codebook training, encoding,
    ADC shortlisting, AND the decimal-summed cosine rescore."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_pq_rerank(emb, emb.filter(F.col("vec_id") < 10), k=5,
                           shortlist=20, m=4, k_codes=16, n_iter=1,
                           exclude_self=True)


@query("basket_part_pairs", oracle="""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT part_a, part_b, count(*) AS n_baskets
FROM pairs GROUP BY part_a, part_b
ORDER BY n_baskets DESC, part_a, part_b
LIMIT 20
""")
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same order,
    top-20 by basket count.  Self-equi-join on the basket key after a
    distinct — ONE shuffle partitioning both sides by l_orderkey, then
    TakeOrderedAndProject for the top-k (no global sort).  Pair fan-out is
    quadratic PER BASKET, which is safe when basket sizes are bounded (7
    here, grocery-scale in practice); for heavy-tailed baskets cap or salt
    the hot baskets first — same guard as minhash_lsh_pairs' bucket_cap."""
    li = load(spark, sf_dir)["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    return (a.join(b, "l_orderkey")
            .filter(F.col("part_a") < F.col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_baskets"))
            .orderBy(F.col("n_baskets").desc(), "part_a", "part_b")
            .limit(20))


@query("table_fingerprint_documents", oracle="""
SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64
         AS bucket,
       count(*) AS n_rows,
       CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':' || md5(text)), 1, 8)
                          AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
         AS hash_sum
FROM documents
GROUP BY 1
""")
def table_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed table fingerprint (operators.fingerprint): 64 buckets of
    (row count, order-insensitive content-hash sum) — how you verify a
    100 TB copy/migration without moving the data: both sides compute 64
    tiny rows, a mismatched bucket pinpoints WHERE to drill down (then
    recurse into that bucket).  Row-local hash expressions + one
    fixed-fan-in shuffle."""
    from localsql_spark.operators.fingerprint import table_fingerprint
    docs = load(spark, sf_dir)["documents"]
    return table_fingerprint(docs, "doc_id", F.col("text"))


_MERGE_UPSERT_ORACLE = """
WITH base AS (
  SELECT doc_id, lang, text, 1 AS version FROM documents),
upd AS (
  SELECT doc_id, lang, 'v2 ' || text AS text, 2 AS version
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 7 = 0
  UNION ALL
  SELECT doc_id + 1000000, lang, 'new ' || text, 1
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 11 = 0),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC)
         AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
SELECT doc_id, lang, version, md5(text) AS text_md5
FROM ranked WHERE rn = 1
"""


@query("merge_upsert_documents", oracle=_MERGE_UPSERT_ORACLE)
def merge_upsert_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE/upsert into a lang-partitioned parquet table
    (sinks.merge.merge_into_partitioned): documents as version-1 base, a
    deterministic correction batch (1/7 of keys re-texted at version 2, 1/11
    inserted as new keys), latest version per key wins.  Only touched
    partitions are read (partition-pruned scan) and rewritten (staged
    directory swap); the driver-side footprint is the touched-partition
    list.  The reference has no persistence at all (table lifetime =
    process, reference: localsql/localsql.py:31) — this is the batch twin
    of the streaming foreachBatch upsert sink."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.merge import merge_into_partitioned

    docs = load(spark, sf_dir)["documents"]
    base = docs.select("doc_id", "lang", "text",
                       F.lit(1).cast("int").alias("version"))
    upd_mod = (docs.filter(hash32(F.col("doc_id")) % 7 == 0)
               .select("doc_id", "lang",
                       F.concat(F.lit("v2 "), F.col("text")).alias("text"),
                       F.lit(2).cast("int").alias("version")))
    upd_new = (docs.filter(hash32(F.col("doc_id")) % 11 == 0)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "lang",
                       F.concat(F.lit("new "), F.col("text")).alias("text"),
                       F.lit(1).cast("int").alias("version")))
    updates = upd_mod.unionByName(upd_new)

    scratch = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "merge_upsert" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(scratch, ignore_errors=True)
    base.write.partitionBy("lang").parquet(str(scratch))
    merge_into_partitioned(spark, str(scratch), updates,
                           key="doc_id", version="version",
                           partition_col="lang")
    out = spark.read.parquet(str(scratch))
    return out.select("doc_id", "lang", "version",
                      F.md5("text").alias("text_md5"))


@query("sketch_quantiles", oracle="""
WITH s AS (
  SELECT CAST(value AS DOUBLE) AS v,
         CAST('0x' || substr(md5('qsk:' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
           AS rk
  FROM events WHERE value IS NOT NULL
  ORDER BY rk, v LIMIT 1024),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, rk) AS rn, count(*) OVER () AS n
  FROM s),
qs AS (SELECT * FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.9), (0.99))
       t(q))
SELECT CAST(q AS DOUBLE) AS q, v AS estimate
FROM r JOIN qs ON rn = CAST(floor(q * (n - 1)) AS BIGINT) + 1
""")
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable quantile sketch (operators.sketches.quantile_sketch):
    bottom-1024 hash-rank uniform sample over events.value — bounded,
    mergeable, and bit-reproducible by any engine with md5, so the oracle
    checks the exact algorithm.  Distribution monitoring at 100 TB runs on
    the broadcastable sketch instead of the exact shuffle-heavy
    percentile_disc path (percentiles_by_event_type is the exact twin)."""
    from localsql_spark.operators.sketches import (quantile_estimates,
                                                   quantile_sketch)

    ev = load(spark, sf_dir)["events"]
    return quantile_estimates(quantile_sketch(ev, "value", "event_id"))


_FP_SQL = """
SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64
         AS bucket,
       count(*) AS n_rows,
       CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':' || md5(text)), 1, 8)
                          AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
         AS hash_sum
FROM {src}
GROUP BY 1
"""


@query("fingerprint_drift", oracle=f"""
WITH snap_b AS (
  SELECT doc_id,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 7 = 0
              THEN 'v2 ' || text ELSE text END AS text
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000, 'new ' || text
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 11 = 0),
fa AS ({_FP_SQL.format(src='documents')}),
fb AS ({_FP_SQL.format(src='snap_b')})
SELECT coalesce(fa.bucket, fb.bucket) AS bucket,
       coalesce(fa.n_rows, 0) AS n_rows_a,
       coalesce(fb.n_rows, 0) AS n_rows_b,
       coalesce(fa.hash_sum, '0') AS hash_a,
       coalesce(fb.hash_sum, '0') AS hash_b
FROM fa FULL OUTER JOIN fb ON fa.bucket = fb.bucket
WHERE fa.n_rows IS DISTINCT FROM fb.n_rows
   OR fa.hash_sum IS DISTINCT FROM fb.hash_sum
""")
def fingerprint_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot drift check (operators.fingerprint.fingerprint_diff):
    fingerprint two corpus versions — the documents table vs a
    deterministically-evolved snapshot (1/7 of keys re-texted, 1/11 new
    keys, the same derivation merge_upsert_documents applies) — and report
    only the buckets whose (count, hash-sum) differ.  Each side is one
    fixed-fan-in aggregation; the diff joins two <= 64-row frames, so the
    comparison cost is independent of corpus size — the snapshot-audit
    primitive for an incrementally-updated 100 TB training corpus."""
    from localsql_spark.operators.fingerprint import (fingerprint_diff,
                                                      table_fingerprint)
    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    snap_b = (docs.select(
        "doc_id",
        F.when(hash32(F.col("doc_id")) % 7 == 0,
               F.concat(F.lit("v2 "), F.col("text")))
        .otherwise(F.col("text")).alias("text"))
        .unionByName(
            docs.filter(hash32(F.col("doc_id")) % 11 == 0)
            .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                    F.concat(F.lit("new "), F.col("text")).alias("text"))))
    fa = table_fingerprint(docs, "doc_id", F.col("text"))
    fb = table_fingerprint(snap_b, "doc_id", F.col("text"))
    return fingerprint_diff(fa, fb)


@query("semdedup_keep", oracle=f"""
WITH assign AS ({_KMEANS_ORACLE}),
ve2 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
               unnest(embedding) AS x FROM embeddings),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE),
                                          12) AS DECIMAL(38,12)))
                           AS DOUBLE)) AS nrm
          FROM ve2 GROUP BY vec_id),
pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM assign a JOIN assign b
            ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id),
dots AS (SELECT p.vec_a, p.vec_b,
                CAST(SUM(CAST(round(CAST(xa.x AS DOUBLE) * CAST(xb.x AS DOUBLE),
                                    12) AS DECIMAL(38,12))) AS DOUBLE) AS dotp
         FROM pairs p
         JOIN ve2 xa ON xa.vec_id = p.vec_a
         JOIN ve2 xb ON xb.vec_id = p.vec_b AND xb.p = xa.p
         GROUP BY 1, 2),
drops AS (SELECT DISTINCT vec_b
          FROM dots
          JOIN norms na ON na.vec_id = vec_a
          JOIN norms nb ON nb.vec_id = vec_b
          WHERE round(dotp / (na.nrm * nb.nrm), 9) >= 0.4)
SELECT a.vec_id, a.cluster_id
FROM assign a LEFT JOIN drops d ON d.vec_b = a.vec_id
WHERE d.vec_b IS NULL
""")
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (operators.similarity.semdedup_prune,
    public algorithm arXiv:2303.09540): k-means clusters the embedding
    space, cosine pairs are compared only WITHIN a cluster, the higher id
    of every above-threshold pair is dropped.  Learned blocking confines the
    quadratic comparison to cluster-local work — the embedding-space
    counterpart of LSH bucketing, catching paraphrase duplicates that
    lexical hashing misses.  The oracle replays the full Lloyd round and
    the intra-cluster pair pruning exactly."""
    emb = load(spark, sf_dir)["embeddings"]
    # threshold 0.4: the synthetic embeddings carry no planted semantic
    # duplicates (max intra-cluster cosine ~0.51 at sf0.01), so the demo
    # threshold sits at the top ~0.1% of intra-cluster pairs to exercise
    # real pruning; production SemDeDup uses ~0.95+ on model embeddings.
    return S.semdedup_prune(emb, n_clusters=8, threshold=0.4, n_iter=1)


@query("sample_per_lang_topk", oracle="""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT), doc_id) AS rn
  FROM documents)
SELECT doc_id, lang, rn FROM r WHERE rn <= 20
""")
def sample_per_lang_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sampling: the 20 docs with the smallest
    md5-hash rank PER LANGUAGE — the reproducible, engine-independent
    analog of per-stratum reservoir sampling (same rows every run, every
    cluster, every engine).  The rank filter compiles to WindowGroupLimit,
    so each shuffle partition keeps only 20 rows per group BEFORE the
    window sort — per-group work is bounded, not corpus-bound
    (plan-asserted in tests/test_plan_shapes.py)."""
    from pyspark.sql import Window

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    w = Window.partitionBy("lang").orderBy(hash32(F.col("doc_id")), "doc_id")
    return (docs.select("doc_id", "lang",
                        F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 20))


_INCR_HASH = ("CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
              "AS BIGINT) % 9")

_INCR_DEDUP_ORACLE = f"""
WITH alls AS (SELECT doc_id, lang, text FROM documents),
{_shingles_cte('alls').lstrip()},
{_MH_CTE},
sig AS (SELECT doc_id, list(c ORDER BY j) AS sig FROM mh GROUP BY doc_id),
bands AS (SELECT doc_id, b,
                 md5(CAST(sig[4*b+1] AS VARCHAR) || '|' || CAST(sig[4*b+2] AS VARCHAR)
                     || '|' || CAST(sig[4*b+3] AS VARCHAR) || '|' || CAST(sig[4*b+4] AS VARCHAR)) AS bkey
          FROM sig CROSS JOIN UNNEST(range({D.N_BANDS})) u3(b)),
nb AS (SELECT doc_id FROM documents WHERE {_INCR_HASH} = 0),
cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                greatest(x.doc_id, y.doc_id) AS doc_b
         FROM bands x
         JOIN bands y ON x.b = y.b AND x.bkey = y.bkey
                      AND x.doc_id <> y.doc_id
         JOIN nb ON nb.doc_id = y.doc_id),
pairsig AS (SELECT doc_a, doc_b, sa.sig AS sig_a, sb.sig AS sig_b
            FROM cand JOIN sig sa ON sa.doc_id = doc_a
                      JOIN sig sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b,
       CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1] THEN 1 ELSE 0 END) AS DOUBLE)
         / {D.N_MINHASH} AS est_jaccard
FROM pairsig CROSS JOIN UNNEST(range({D.N_MINHASH})) u4(j)
GROUP BY doc_a, doc_b
HAVING CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1] THEN 1 ELSE 0 END) AS DOUBLE)
         / {D.N_MINHASH} >= 0.5
"""


@query("dedup_incremental_new_batch", oracle=_INCR_DEDUP_ORACLE)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection
    (operators.dedup.minhash_lsh_pairs_incremental): a deterministic 1/9 of
    documents plays the freshly-ingested batch, the rest the
    already-deduped corpus; only pairs TOUCHING the new batch are produced
    — the band join probes the corpus index with new-batch bands, so
    corpus-vs-corpus work never recurs and the daily cost tracks the
    ingest size, not the corpus size."""
    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    is_new = hash32(F.col("doc_id")) % 9 == 0
    return D.minhash_lsh_pairs_incremental(
        docs.filter(~is_new), docs.filter(is_new), threshold=0.5)


@query("dedup_incremental_store", oracle=_INCR_DEDUP_ORACLE)
def dedup_incremental_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shape incremental near-dup
    (operators.dedup.minhash_lsh_pairs_from_store): the corpus side is the
    PERSISTED (doc_id, sig) signature store written by yesterday's run
    (write_signature_store), probed by today's batch — corpus text is never
    re-shingled; the corpus cost is one narrow columnar scan (~1% of corpus
    bytes at 100 TB).  Since round 7 the probe goes through the sidecar
    band-partitioned index by default (minhash_lsh_pairs_from_store
    auto_index; PartitionFilters plan-asserted), so candidate generation
    is partition-pruned rather than a linear store scan.  The store +
    index are a content-stable FIXTURE cached across runs (signatures of
    a fixed corpus are deterministic; the version tag below invalidates
    the cache on semantic change) — what this query times is the probe,
    i.e. the daily-loop steady state, same framing as knn_ivf_index_top5.
    Same pair semantics as dedup_incremental_new_batch (shared oracle)."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    is_new = hash32(F.col("doc_id")) % 9 == 0

    # v2: banded sidecar index era (bump to invalidate cached fixtures)
    store = (Path(__file__).resolve().parent.parent.parent / ".cache"
             / "sig_store_v2" / Path(sf_dir.rstrip("/")).name)
    marker = store / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(f"{store}_banded", ignore_errors=True)
        D.write_signature_store(docs.filter(~is_new), str(store))
        D.ensure_banded_index(spark, str(store), f"{store}_banded")
        marker.touch()
    return D.minhash_lsh_pairs_from_store(
        spark, str(store), docs.filter(is_new), threshold=0.5)


_STREAM_INGEST_HASH3 = ("CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), "
                        "1, 8) AS BIGINT) % 3")

# Sequential greedy dedup unrolled over the three micro-batches: signatures
# (and therefore the >= 0.5 pair set) are batch-independent, so allp is
# computed ONCE globally and each stage is pure set algebra over it —
# corpus rule: drop a batch doc colliding with any KEPT earlier doc (either
# pair direction); intra-batch rule: drop the greater id of a colliding
# batch pair (decided against the pre-drop pair set, matching the one-pass
# implementation).
_STREAM_INGEST_ORACLE = f"""
WITH {_shingles_cte().lstrip()},
{_MH_CTE},
sig AS (SELECT doc_id, list(c ORDER BY j) AS sig FROM mh GROUP BY doc_id),
bands AS (SELECT doc_id, b,
                 md5(CAST(sig[4*b+1] AS VARCHAR) || '|' || CAST(sig[4*b+2] AS VARCHAR)
                     || '|' || CAST(sig[4*b+3] AS VARCHAR) || '|' || CAST(sig[4*b+4] AS VARCHAR)) AS bkey
          FROM sig CROSS JOIN UNNEST(range({D.N_BANDS})) u3(b)),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bands x JOIN bands y
           ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
pairsig AS (SELECT doc_a, doc_b, sa.sig AS sig_a, sb.sig AS sig_b
            FROM cand JOIN sig sa ON sa.doc_id = doc_a
                      JOIN sig sb ON sb.doc_id = doc_b),
allp AS (SELECT doc_a, doc_b
         FROM pairsig CROSS JOIN UNNEST(range({D.N_MINHASH})) u4(j)
         GROUP BY doc_a, doc_b
         HAVING CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1]
                              THEN 1 ELSE 0 END) AS DOUBLE)
                  / {D.N_MINHASH} >= 0.5),
p2 AS (SELECT doc_a AS x, doc_b AS y FROM allp
       UNION ALL SELECT doc_b, doc_a FROM allp),
bt AS (SELECT doc_id, lang, {_STREAM_INGEST_HASH3} AS b FROM documents),
k0 AS (SELECT d.doc_id, d.lang FROM bt d WHERE d.b = 0
       AND NOT EXISTS (SELECT 1 FROM p2 JOIN bt e ON p2.x = e.doc_id
                       WHERE p2.y = d.doc_id AND e.b = 0
                         AND p2.x < d.doc_id)),
k1 AS (SELECT d.doc_id, d.lang FROM bt d WHERE d.b = 1
       AND NOT EXISTS (SELECT 1 FROM p2 JOIN k0 ON p2.x = k0.doc_id
                       WHERE p2.y = d.doc_id)
       AND NOT EXISTS (SELECT 1 FROM p2 JOIN bt e ON p2.x = e.doc_id
                       WHERE p2.y = d.doc_id AND e.b = 1
                         AND p2.x < d.doc_id)),
k01 AS (SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1),
k2 AS (SELECT d.doc_id, d.lang FROM bt d WHERE d.b = 2
       AND NOT EXISTS (SELECT 1 FROM p2 JOIN k01 ON p2.x = k01.doc_id
                       WHERE p2.y = d.doc_id)
       AND NOT EXISTS (SELECT 1 FROM p2 JOIN bt e ON p2.x = e.doc_id
                       WHERE p2.y = d.doc_id AND e.b = 2
                         AND p2.x < d.doc_id))
SELECT doc_id, lang FROM k0
UNION ALL SELECT doc_id, lang FROM k1
UNION ALL SELECT doc_id, lang FROM k2
"""


@query("streaming_dedup_ingest", oracle=_STREAM_INGEST_ORACLE)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-on-ingest, driver-gated end-to-end
    (streaming.stream_dedup_ingest): documents arrive as three micro-
    batches (deterministic hash-mod split, mtime-ordered files,
    maxFilesPerTrigger=1); each batch probes the PERSISTED signature
    store via banded LSH, keeps the non-colliding docs (lower id wins
    within a batch, any kept corpus doc wins across batches), and commits
    keepers + their signatures idempotently (per-batch overwrite dirs +
    checkpoint = effectively-exactly-once).  The oracle replays the
    sequential greedy semantics exactly — batch-independent signatures
    let it compute the global pair set once and unroll the three stages
    as set algebra.  This is the continuously-running form of the daily
    incremental-dedup loop: per-batch cost is O(batch x bands) probes
    against the index, never corpus-vs-corpus."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.streaming.stream_dedup_ingest import (
        read_accepted, stream_dedup_ingest)

    docs = load(spark, sf_dir)["documents"]
    src_dir = (_CACHE_DIR.parent / "stream_dedup_ingest"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        # temp-build + rename: existence implies completeness (same
        # contract as the late-data landing dir, stream_agg.py)
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="ingest_split_")
            (docs.filter(hash32(F.col("doc_id")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    out = tempfile.mkdtemp(prefix="ingest_out_")
    store = tempfile.mkdtemp(prefix="ingest_store_")
    ck = tempfile.mkdtemp(prefix="ingest_ck_")
    stream_dedup_ingest(spark, source_dir=str(src_dir), schema=schema,
                        store_dir=store, out_dir=out, checkpoint_dir=ck,
                        threshold=0.5)
    return read_accepted(spark, out).select("doc_id", "lang")


@query("dedup_incremental_banded", oracle=_INCR_DEDUP_ORACLE)
def dedup_incremental_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup via the BAND-PARTITIONED index
    (operators.dedup.write_banded_index / minhash_lsh_pairs_from_banded_
    index): candidate generation reads only the index partitions the new
    batch's band keys hit (hive-partitioned on the band key's first two
    hex chars; PartitionFilters plan-asserted in tests), replacing the
    flat store's whole-corpus scan+band+shuffle — the scale path SCALE.md
    names once the store scan dominates the daily probe.  Same pair
    semantics as dedup_incremental_store (shared oracle)."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    is_new = hash32(F.col("doc_id")) % 9 == 0

    root = (Path(__file__).resolve().parent.parent.parent / ".cache"
            / "band_index" / Path(sf_dir.rstrip("/")).name)
    store, index = root / "sigs", root / "index"
    shutil.rmtree(root, ignore_errors=True)
    D.write_signature_store(docs.filter(~is_new), str(store))
    D.write_banded_index(D.read_signature_store(spark, str(store))
                         .select("doc_id", "sig"),
                         str(index))
    return D.minhash_lsh_pairs_from_banded_index(
        spark, str(index), str(store), docs.filter(is_new), threshold=0.5)


@query("sketch_quantiles_by_type", oracle="""
WITH s AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS v,
         CAST('0x' || substr(md5('qsk:' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
           AS rk
  FROM events WHERE value IS NOT NULL),
sk AS (SELECT grp, v, rk FROM (
         SELECT grp, v, rk,
                row_number() OVER (PARTITION BY grp ORDER BY rk, v) AS srn
         FROM s) t WHERE srn <= 1024),
r AS (SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v, rk) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM sk),
qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.75), (0.99)) t(q))
SELECT grp, CAST(q AS DOUBLE) AS q, v AS estimate
FROM r JOIN qs ON rn = CAST(floor(q * (n - 1)) AS BIGINT) + 1
""")
def sketch_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped portable quantile sketch
    (operators.sketches.quantile_sketch_by): per-event-type bottom-1024
    hash-rank samples — the per-source distribution monitoring a pipeline
    dashboards at 100 TB, bounded (k rows per group whatever the corpus),
    mergeable (bottom-k of unioned sketches), and bit-reproducible on any
    engine with md5 so the oracle checks the exact algorithm.  The rank
    filter compiles to WindowGroupLimit: per-group work is bounded before
    the window sort."""
    from localsql_spark.operators.sketches import (quantile_estimates_by,
                                                   quantile_sketch_by)

    ev = load(spark, sf_dir)["events"]
    return quantile_estimates_by(
        quantile_sketch_by(ev, "value", "event_id", "event_type"))


@query("dedup_exact_incremental", oracle=r"""
WITH h AS (SELECT doc_id,
                  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                    AS text_hash,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 9 AS grp
           FROM documents)
SELECT d.doc_id, d.text_hash
FROM h d
WHERE d.grp = 0
  AND NOT EXISTS (SELECT 1 FROM h c
                  WHERE c.grp <> 0 AND c.text_hash = d.text_hash)
  AND NOT EXISTS (SELECT 1 FROM h e
                  WHERE e.grp = 0 AND e.text_hash = d.text_hash
                    AND e.doc_id < d.doc_id)
""")
def dedup_exact_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup against the persisted content-hash store
    (operators.dedup.exact_dedup_incremental): the cheap FIRST gate of the
    incremental ingest loop — a new batch keeps only never-seen content
    (lowest id within the batch), via one batch-bounded window and one
    left-anti join against the store's two-column hash table; the minhash
    probe then runs only on what survives.  Same 1/9 batch split as the
    near-dup incremental queries."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    is_new = hash32(F.col("doc_id")) % 9 == 0
    store = (Path(__file__).resolve().parent.parent.parent / ".cache"
             / "hash_store" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(store, ignore_errors=True)
    D.write_content_hash_store(docs.filter(~is_new), str(store))
    return D.exact_dedup_incremental(spark, str(store), docs.filter(is_new))


@query("knn_ivf_index_top5", oracle=_IVF_ORACLE)
def knn_ivf_index_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF kNN against the PERSISTED index
    (operators.similarity.write_ivf_index / knn_ivf_from_index): the
    production similarity-search shape — cell assignment paid once at
    index-write time (hive-partitioned by cell), each query batch routes
    on a tiny centroid read and scans only its probed cells' partitions
    (PartitionFilters plan-asserted in tests).  Identical results to
    knn_ivf_top5 (shared oracle); the similarity twin of the banded LSH
    dedup index."""
    import shutil
    from pathlib import Path

    emb = load(spark, sf_dir)["embeddings"]
    index = (Path(__file__).resolve().parent.parent.parent / ".cache"
             / "ivf_index" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(index, ignore_errors=True)
    S.write_ivf_index(emb, str(index), n_cells=16)
    return S.knn_ivf_from_index(spark, str(index),
                                emb.filter(F.col("vec_id") < 10), k=5,
                                n_probe=4)


@query("knn_ivf_index_append_top5", oracle=_IVF_ORACLE)
def knn_ivf_index_append_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained IVF index (operators.similarity.
    append_ivf_index / compact_ivf_index): the base index is built from
    ~4/5 of the corpus (hash-mod, seed vectors forced into the base so
    the centroid table is complete), the remaining batch appends as an
    idempotent cell-partitioned delta assigned against the EXISTING
    centroids — per-batch cost tracks the BATCH, never the accumulated
    corpus — then compaction folds the delta into the base layout and
    the probe runs.  Sharing knn_ivf_top5's oracle proves
    base + append + compact == the index built from the full corpus in
    one shot, the invariance daily ANN ingest must hold."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.operators.similarity import (append_ivf_index,
                                                     compact_ivf_index)

    emb = load(spark, sf_dir)["embeddings"]
    index = (Path(__file__).resolve().parent.parent.parent / ".cache"
             / "ivf_index_incr" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(index, ignore_errors=True)
    m = F.pmod(hash32(F.col("vec_id")), F.lit(5))
    base = emb.filter((m >= 1) | (F.col("vec_id") < 16))
    delta = emb.filter((m == 0) & (F.col("vec_id") >= 16))
    S.write_ivf_index(base, str(index), n_cells=16)
    append_ivf_index(spark, str(index), delta, batch_id=1)
    compact_ivf_index(spark, str(index))
    return S.knn_ivf_from_index(spark, str(index),
                                emb.filter(F.col("vec_id") < 10), k=5,
                                n_probe=4)


@query("streaming_ivf_ingest_top5", oracle=_IVF_ORACLE)
def streaming_ivf_ingest_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embedding ingest into the persisted IVF index, driven
    end-to-end (streaming.stream_ivf_ingest): the base index is built
    from ~3/5 of the corpus (seed vectors forced into the base so the
    centroid table is complete), the remaining vectors arrive as an
    mtime-ordered file stream (maxFilesPerTrigger=1) and fold in as
    idempotent cell-partitioned deltas assigned against the EXISTING
    centroids, then compaction folds the generations and the probe runs.
    Sharing knn_ivf_top5's oracle proves base + streamed appends +
    compact == the index built from the full corpus in one shot — the
    invariance continuous ANN ingest must hold."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.operators.similarity import compact_ivf_index
    from localsql_spark.streaming.stream_ivf_ingest import stream_ivf_ingest

    emb = load(spark, sf_dir)["embeddings"]
    m = F.pmod(hash32(F.col("vec_id")), F.lit(5))
    base = emb.filter((m >= 2) | (F.col("vec_id") < 16))
    rest = m.isin(0, 1) & (F.col("vec_id") >= 16)
    batches = (emb.filter(rest & (m == 0)), emb.filter(rest & (m == 1)))

    src_dir = (_CACHE_DIR.parent / "stream_ivf_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch1.parquet", "b_batch2.parquet")
        for name, batch in zip(names, batches):
            tmp = tempfile.mkdtemp(prefix="ivfsplit_")
            batch.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch1.parquet")).schema
    index = tempfile.mkdtemp(prefix="ivf_stream_idx_")
    ck = tempfile.mkdtemp(prefix="ivf_stream_ck_")
    try:
        S.write_ivf_index(base, index, n_cells=16)
        stream_ivf_ingest(spark, source_dir=str(src_dir), schema=schema,
                          index_path=index, checkpoint_dir=ck)
        compact_ivf_index(spark, index)
        return S.knn_ivf_from_index(spark, index,
                                    emb.filter(F.col("vec_id") < 10), k=5,
                                    n_probe=4).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(index, ignore_errors=True)


# Full incremental-ingest decision audit: exact gate first (content-hash
# store), minhash probe only on exact-survivors.  Signatures are global, so
# the oracle reuses the global >= 0.5 pair set and restricts it per rule.
_PIPELINE_INCR_ORACLE = f"""
WITH {_shingles_cte().lstrip()},
{_MH_CTE},
sig AS (SELECT doc_id, list(c ORDER BY j) AS sig FROM mh GROUP BY doc_id),
bands AS (SELECT doc_id, b,
                 md5(CAST(sig[4*b+1] AS VARCHAR) || '|' || CAST(sig[4*b+2] AS VARCHAR)
                     || '|' || CAST(sig[4*b+3] AS VARCHAR) || '|' || CAST(sig[4*b+4] AS VARCHAR)) AS bkey
          FROM sig CROSS JOIN UNNEST(range({D.N_BANDS})) u3(b)),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bands x JOIN bands y
           ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
pairsig AS (SELECT doc_a, doc_b, sa.sig AS sig_a, sb.sig AS sig_b
            FROM cand JOIN sig sa ON sa.doc_id = doc_a
                      JOIN sig sb ON sb.doc_id = doc_b),
allp AS (SELECT doc_a, doc_b
         FROM pairsig CROSS JOIN UNNEST(range({D.N_MINHASH})) u4(j)
         GROUP BY doc_a, doc_b
         HAVING CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1]
                              THEN 1 ELSE 0 END) AS DOUBLE)
                  / {D.N_MINHASH} >= 0.5),
p2 AS (SELECT doc_a AS x, doc_b AS y FROM allp
       UNION ALL SELECT doc_b, doc_a FROM allp),
h AS (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS text_hash,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 9 AS grp
      FROM documents),
surv AS (SELECT d.doc_id FROM h d
         WHERE d.grp = 0
           AND NOT EXISTS (SELECT 1 FROM h c
                           WHERE c.grp <> 0 AND c.text_hash = d.text_hash)
           AND NOT EXISTS (SELECT 1 FROM h e
                           WHERE e.grp = 0 AND e.text_hash = d.text_hash
                             AND e.doc_id < d.doc_id)),
near_drop AS (SELECT s.doc_id FROM surv s
              WHERE EXISTS (
                SELECT 1 FROM p2 JOIN h p ON p2.x = p.doc_id
                WHERE p2.y = s.doc_id
                  AND (p.grp <> 0
                       OR (p2.x < s.doc_id
                           AND p2.x IN (SELECT doc_id FROM surv)))))
SELECT d.doc_id,
       CASE WHEN s.doc_id IS NULL THEN 'dropped_exact'
            WHEN nd.doc_id IS NOT NULL THEN 'dropped_near'
            ELSE 'kept' END AS decision
FROM h d
LEFT JOIN surv s ON s.doc_id = d.doc_id
LEFT JOIN near_drop nd ON nd.doc_id = d.doc_id
WHERE d.grp = 0
"""


@query("pipeline_incremental_ingest", oracle=_PIPELINE_INCR_ORACLE)
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete incremental-ingest decision audit, composed from the
    persisted stores: the batch passes the exact gate first
    (exact_dedup_incremental vs the content-hash store — cheap, catches
    verbatim copies before any signature work), then only exact-survivors
    probe the minhash signature store; every batch doc gets a decision
    (dropped_exact / dropped_near / kept — lower id wins among surviving
    batch collisions, any corpus doc wins cross-set).  This is the
    per-document lineage a production ingest run logs; per-batch cost is
    one hash anti-join plus O(survivors x bands) probes."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    is_new = hash32(F.col("doc_id")) % 9 == 0
    batch, corpus = docs.filter(is_new), docs.filter(~is_new)

    root = (Path(__file__).resolve().parent.parent.parent / ".cache"
            / "pipeline_incr" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(root, ignore_errors=True)
    hash_store, sig_store = root / "hashes", root / "sigs"
    D.write_content_hash_store(corpus, str(hash_store))
    D.write_signature_store(corpus, str(sig_store))

    exact_keep = D.exact_dedup_incremental(spark, str(hash_store), batch) \
                  .select("doc_id")
    survivors = batch.join(exact_keep, "doc_id", "left_semi")
    pairs = D.minhash_lsh_pairs_from_store(spark, str(sig_store), survivors,
                                           threshold=0.5)
    # drop victim per pair: both survivors -> greater id; else the batch
    # side (the partner is corpus)
    si = exact_keep
    flags = (pairs
             .join(F.broadcast(si.select(F.col("doc_id").alias("doc_a"),
                                         F.lit(True).alias("a_in"))),
                   "doc_a", "left")
             .join(F.broadcast(si.select(F.col("doc_id").alias("doc_b"),
                                         F.lit(True).alias("b_in"))),
                   "doc_b", "left"))
    near_drops = (flags.select(
        F.when(F.col("a_in") & F.col("b_in"), F.col("doc_b"))
        .when(F.col("a_in"), F.col("doc_a"))
        .otherwise(F.col("doc_b")).alias("doc_id"))
        .distinct())
    return (batch.select("doc_id")
            .join(exact_keep.withColumn("__surv", F.lit(True)),
                  "doc_id", "left")
            .join(near_drops.withColumn("__near", F.lit(True)),
                  "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("__surv").isNull(), "dropped_exact")
                    .when(F.col("__near").isNotNull(), "dropped_near")
                    .otherwise("kept").alias("decision")))


_DECON_MINHASH_ORACLE = f"""
WITH {_shingles_cte().lstrip()},
{_MH_CTE},
sig AS (SELECT doc_id, list(c ORDER BY j) AS sig FROM mh GROUP BY doc_id),
bands AS (SELECT doc_id, b,
                 md5(CAST(sig[4*b+1] AS VARCHAR) || '|' || CAST(sig[4*b+2] AS VARCHAR)
                     || '|' || CAST(sig[4*b+3] AS VARCHAR) || '|' || CAST(sig[4*b+4] AS VARCHAR)) AS bkey
          FROM sig CROSS JOIN UNNEST(range({D.N_BANDS})) u3(b)),
ev AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                greatest(x.doc_id, y.doc_id) AS doc_b
         FROM bands x
         JOIN bands y ON x.b = y.b AND x.bkey = y.bkey
                      AND x.doc_id <> y.doc_id
         JOIN ev ON ev.doc_id = y.doc_id),
pairsig AS (SELECT doc_a, doc_b, sa.sig AS sig_a, sb.sig AS sig_b
            FROM cand JOIN sig sa ON sa.doc_id = doc_a
                      JOIN sig sb ON sb.doc_id = doc_b),
nd AS (SELECT doc_a, doc_b
       FROM pairsig CROSS JOIN UNNEST(range({D.N_MINHASH})) u4(j)
       GROUP BY doc_a, doc_b
       HAVING CAST(sum(CASE WHEN sig_a[j+1] = sig_b[j+1]
                            THEN 1 ELSE 0 END) AS DOUBLE)
                / {D.N_MINHASH} >= 0.5),
contam AS (SELECT DISTINCT t FROM (
             SELECT doc_a AS t, doc_b AS e FROM nd
             UNION ALL SELECT doc_b, doc_a FROM nd) p
           JOIN ev ON ev.doc_id = p.e
           WHERE t NOT IN (SELECT doc_id FROM ev))
SELECT d.doc_id, (c.t IS NOT NULL) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
LEFT JOIN contam c ON c.t = d.doc_id
"""


@query("decontaminate_minhash", oracle=_DECON_MINHASH_ORACLE)
def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate benchmark decontamination via the incremental-probe
    machinery (operators.dedup.pairs_touching_new with the EVAL set as the
    probe side): a training doc is contaminated if its minhash jaccard vs
    any held-out eval doc reaches 0.5 — catching paraphrased leakage the
    exact n-gram check (decontaminate_training_set) misses.  The eval set
    is the small side, so probe work is O(eval x bands) against the train
    band index, never train-vs-train; at 100 TB this is the same persisted
    signature-store probe the daily dedup runs, pointed at a benchmark."""
    from localsql_spark.operators.dedup import (compute_signatures,
                                                pairs_touching_new)

    docs = load(spark, sf_dir)["documents"]
    is_eval = F.col("doc_id") % 50 == 0
    train, ev = docs.filter(~is_eval), docs.filter(is_eval)
    pairs = pairs_touching_new(compute_signatures(train),
                               compute_signatures(ev),
                               threshold=0.5, n=D.N_MINHASH,
                               bands=D.N_BANDS)
    ev_ids = ev.select(F.col("doc_id").alias("eid"))
    sides = (pairs.select(F.col("doc_a").alias("t"),
                          F.col("doc_b").alias("e"))
             .unionByName(pairs.select(F.col("doc_b").alias("t"),
                                       F.col("doc_a").alias("e"))))
    contam = (sides.join(F.broadcast(ev_ids),
                         sides.e == F.col("eid"))
              .join(F.broadcast(ev_ids.withColumnRenamed("eid", "tid")),
                    sides.t == F.col("tid"), "left_anti")
              .select(F.col("t").alias("doc_id")).distinct()
              .withColumn("__c", F.lit(True)))
    return (train.select("doc_id")
            .join(contam, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("__c"), F.lit(False))
                    .alias("contaminated")))


@query("validate_orders_constraints", oracle="""
WITH n AS (SELECT count(*) AS n_rows FROM orders),
v AS (
  SELECT 'not_null(o_custkey)' AS rule,
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS violations
  UNION ALL
  SELECT 'unique(o_orderkey)',
         (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)
  UNION ALL
  SELECT 'between(o_totalprice,0.0,1000000.0)',
         (SELECT count(*) FROM orders
          WHERE o_totalprice IS NULL OR o_totalprice < 0
             OR o_totalprice > 1000000)
  UNION ALL
  SELECT 'accepted(o_orderstatus)',
         (SELECT count(*) FROM orders
          WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P'))
  UNION ALL
  SELECT 'matches(o_orderpriority)',
         (SELECT count(*) FROM orders
          WHERE o_orderpriority IS NULL
             OR NOT regexp_matches(o_orderpriority, '^[1-5]-'))
  UNION ALL
  SELECT 'refers_to(o_custkey)',
         (SELECT count(*) FROM orders o
          WHERE o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
)
SELECT rule, n.n_rows, violations, violations = 0 AS passed FROM v, n
""")
def validate_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint gate (operators.quality.check_constraints —
    the Deequ/Great-Expectations pattern): six declarative rules over
    `orders` (not-null, key uniqueness, numeric bounds, accepted values,
    format regex, FK referential integrity to `customer`) evaluated as ONE
    aggregation pass plus one broadcast anti-join for the FK — adding
    row-local rules adds columns, not scans.  Output is a bounded
    per-rule report a pipeline stores per ingest batch and alerts on.
    The oracle recomputes every rule independently in SQL."""
    from localsql_spark.operators import quality as Q

    t = load(spark, sf_dir)
    rules = [
        Q.not_null("o_custkey"),
        Q.unique("o_orderkey"),
        Q.between("o_totalprice", 0.0, 1000000.0),
        Q.accepted("o_orderstatus", ["O", "F", "P"]),
        Q.matches("o_orderpriority", "^[1-5]-"),
        Q.refers_to("o_custkey", t["customer"], "c_custkey"),
    ]
    return (Q.check_constraints(t["orders"], rules)
            .withColumnRenamed("constraint", "rule"))


@query("quarantine_orders_rows", oracle="""
WITH q AS (
  SELECT o_orderkey,
         concat_ws(',',
           CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                     OR o_totalprice > 450000
                THEN 'between(o_totalprice,0.0,450000.0)' END,
           CASE WHEN o_orderpriority IS NULL
                     OR NOT regexp_matches(o_orderpriority, '^[1-4]-')
                THEN 'matches(o_orderpriority)' END) AS failed
  FROM orders)
SELECT o_orderkey, failed FROM q WHERE failed <> ''
""")
def quarantine_orders_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine routing (operators.quality.validate_and_split —
    the dead-letter half of the constraint gate): every order failing at
    least one rule, tagged with the rule-order list of failed rule names.
    The battery also carries a unique() and an FK refers_to() rule that
    this data passes, so the join-backed annotation paths execute in the
    gated plan too.  The oracle rebuilds the failed-rule list with
    NULL-skipping concat_ws in exactly the rule order."""
    from localsql_spark.operators import quality as Q

    t = load(spark, sf_dir)
    rules = [
        Q.between("o_totalprice", 0.0, 450000.0),
        Q.matches("o_orderpriority", "^[1-4]-"),
        Q.unique("o_orderkey"),
        Q.refers_to("o_custkey", t["customer"], "c_custkey"),
    ]
    _, quarantined = Q.validate_and_split(t["orders"], rules)
    return quarantined.select(
        "o_orderkey", F.array_join("failed_rules", ",").alias("failed"))


@query("diff_orders_versions", oracle="""
WITH newv AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 103 = 0),
oldv AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
d AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
              THEN 'changed' END AS change,
         concat_ws(',',
           CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                     AND o.o_totalprice IS DISTINCT FROM n.o_totalprice
                THEN 'o_totalprice' END,
           CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                     AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                THEN 'o_orderstatus' END) AS changed
  FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey)
SELECT o_orderkey, change, changed FROM d WHERE change IS NOT NULL
""")
def diff_orders_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level version diff (operators.diff.table_diff): orders vs a
    deterministically perturbed next version (keys %101 removed, %97
    price-bumped, %103 re-added under shifted keys) -> one row per
    added/removed/changed key with the changed-column list.  One full-outer
    co-partitioned join; unchanged rows never leave the join stage.  The
    oracle rebuilds the same perturbation and diffs with IS DISTINCT FROM
    (the null-safe equality twin of eqNullSafe)."""
    from localsql_spark.operators.diff import table_diff

    t = load(spark, sf_dir)
    orders = t["orders"]
    key = F.col("o_orderkey")
    new = (orders.filter(key % 101 != 0)
           .withColumn("o_totalprice",
                       F.when(key % 97 == 0, F.col("o_totalprice") + 1.0)
                       .otherwise(F.col("o_totalprice")))
           .unionByName(orders.filter(key % 103 == 0)
                        .withColumn("o_orderkey", key + 100000000)))
    d = table_diff(orders, new, ["o_orderkey"],
                   ["o_totalprice", "o_orderstatus"])
    return d.select("o_orderkey", "change",
                    F.array_join("changed_cols", ",").alias("changed"))


@query("scd2_customer_history", oracle="""
WITH upd AS (
  SELECT c_custkey, 'MIGRATED' AS seg FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment FROM customer
  WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW' FROM customer WHERE c_custkey % 50 = 0),
cur AS (SELECT c_custkey, c_mktsegment AS seg FROM customer),
hist AS (
  SELECT c.c_custkey, c.seg, CAST(1000000 AS BIGINT) AS valid_from_us,
         CASE WHEN u.c_custkey IS NOT NULL AND u.seg IS DISTINCT FROM c.seg
              THEN CAST(2000000 AS BIGINT) END AS valid_to_us
  FROM cur c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
  UNION ALL
  SELECT u.c_custkey, u.seg, CAST(2000000 AS BIGINT), NULL
  FROM upd u LEFT JOIN cur c ON c.c_custkey = u.c_custkey
  WHERE c.c_custkey IS NULL OR u.seg IS DISTINCT FROM c.seg)
SELECT c_custkey, seg AS c_mktsegment, valid_from_us, valid_to_us,
       valid_to_us IS NULL AS is_current
FROM hist
""")
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance (operators.scd2 — Kimball pattern):
    initialize history from `customer` at t0, apply one update batch at t1
    (keys %7 re-segmented to 'MIGRATED', keys %13 sent UNCHANGED to prove
    the no-op path stays open, %50 appearing as brand-new keys) and return
    the full version history with validity intervals.  One co-partitioned
    full-outer join per batch, row-local <=2-struct explode; closed rows
    append-only.  The oracle derives the same history set-theoretically:
    every original row (closed iff a differing update hit it) plus one new
    open version per differing-or-new key."""
    from localsql_spark.operators.scd2 import scd2_apply, scd2_init

    t = load(spark, sf_dir)
    cust = t["customer"]
    key = F.col("c_custkey")
    hist0 = scd2_init(cust, ["c_custkey"], ["c_mktsegment"], 1_000_000)
    updates = (cust.filter(key % 7 == 0)
               .withColumn("c_mktsegment", F.lit("MIGRATED"))
               .unionByName(cust.filter((key % 13 == 0) & (key % 7 != 0)))
               .unionByName(cust.filter(key % 50 == 0)
                            .withColumn("c_custkey", key + 1000000)
                            .withColumn("c_mktsegment", F.lit("NEW")))
               .select("c_custkey", "c_mktsegment"))
    hist1 = scd2_apply(hist0, updates, ["c_custkey"], ["c_mktsegment"],
                       2_000_000)
    return hist1.select(
        "c_custkey", "c_mktsegment", "valid_from_us", "valid_to_us",
        F.col("valid_to_us").isNull().alias("is_current"))


@query("streaming_quarantine_events", oracle="""
SELECT event_id,
       concat_ws(',',
         CASE WHEN user_id IS NULL THEN 'not_null(user_id)' END,
         CASE WHEN value IS NULL OR value < 0 OR value > 400
              THEN 'between(value,0.0,400.0)' END,
         CASE WHEN event_type IS NULL OR NOT regexp_matches(
                   event_type, '^(view|click|purchase|signup)$')
              THEN 'matches(event_type)' END) AS failed
FROM events
WHERE user_id IS NULL OR value IS NULL OR value < 0 OR value > 400
   OR event_type IS NULL
   OR NOT regexp_matches(event_type, '^(view|click|purchase|signup)$')
""")
def streaming_quarantine_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming validate-on-ingest, driver-gated end-to-end
    (streaming.stream_validate_ingest): events arrive as three
    micro-batches (hash-mod split, mtime-ordered, maxFilesPerTrigger=1);
    each batch runs the row-local constraint battery and routes rows —
    passers to the accepted sink, violators to the quarantine sink with
    their failed-rule list (per-batch overwrite dirs + checkpoint =
    effectively-exactly-once).  Row-local rules are batching-independent,
    so the batch SQL over the whole table is an EXACT oracle for the
    streamed result — that invariance is the correctness claim."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.operators import quality as Q
    from localsql_spark.streaming.stream_validate_ingest import (
        read_routed, stream_validate_ingest)

    ev = load(spark, sf_dir)["events"]
    src_dir = (_CACHE_DIR.parent / "stream_validate"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="vsplit_")
            (ev.filter(hash32(F.col("event_id")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    out = tempfile.mkdtemp(prefix="vout_")
    quar = tempfile.mkdtemp(prefix="vquar_")
    ck = tempfile.mkdtemp(prefix="vck_")
    rules = [
        Q.not_null("user_id"),
        Q.between("value", 0.0, 400.0),
        Q.matches("event_type", "^(view|click|purchase|signup)$"),
    ]
    stream_validate_ingest(spark, source_dir=str(src_dir), schema=schema,
                           rules=rules, out_dir=out, quarantine_dir=quar,
                           checkpoint_dir=ck)
    return read_routed(spark, quar).select("event_id", "failed")


@query("scd2_customer_asof", oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 7 = 0 THEN 'MIGRATED'
            ELSE c_mktsegment END AS c_mktsegment
FROM customer
UNION ALL
SELECT c_custkey + 1000000, 'NEW' FROM customer WHERE c_custkey % 50 = 0
""")
def scd2_customer_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of read over the SCD2 history (operators.scd2.scd2_as_of): the
    dimension exactly at the update-batch timestamp — closed versions
    excluded (valid_to = ts is exclusive), the batch's new versions
    included (valid_from = ts is inclusive).  The oracle is the post-batch
    state derived directly from the base table, proving interval
    boundary semantics end-to-end."""
    from localsql_spark.operators.scd2 import scd2_apply, scd2_as_of, scd2_init

    t = load(spark, sf_dir)
    cust = t["customer"]
    key = F.col("c_custkey")
    hist0 = scd2_init(cust, ["c_custkey"], ["c_mktsegment"], 1_000_000)
    updates = (cust.filter(key % 7 == 0)
               .withColumn("c_mktsegment", F.lit("MIGRATED"))
               .unionByName(cust.filter((key % 13 == 0) & (key % 7 != 0)))
               .unionByName(cust.filter(key % 50 == 0)
                            .withColumn("c_custkey", key + 1000000)
                            .withColumn("c_mktsegment", F.lit("NEW")))
               .select("c_custkey", "c_mktsegment"))
    hist1 = scd2_apply(hist0, updates, ["c_custkey"], ["c_mktsegment"],
                       2_000_000)
    return scd2_as_of(hist1, 2_000_000)


_SCD2_STORE_ORACLE = """
WITH cur0 AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
u1 AS (
  SELECT c_custkey AS k, 'MIGRATED' AS seg FROM customer
  WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW' FROM customer WHERE c_custkey % 50 = 0),
closed1 AS (
  SELECT c.k, c.seg, CAST(1000000 AS BIGINT) AS f, CAST(2000000 AS BIGINT) AS t
  FROM cur0 c JOIN u1 u ON c.k = u.k AND u.seg IS DISTINCT FROM c.seg),
open1 AS (
  SELECT c.k, c.seg, CAST(1000000 AS BIGINT) AS f
  FROM cur0 c LEFT JOIN u1 u ON c.k = u.k
  WHERE u.k IS NULL OR u.seg IS NOT DISTINCT FROM c.seg
  UNION ALL
  SELECT u.k, u.seg, CAST(2000000 AS BIGINT)
  FROM u1 u LEFT JOIN cur0 c ON c.k = u.k
  WHERE c.k IS NULL OR u.seg IS DISTINCT FROM c.seg),
u2 AS (
  SELECT c_custkey AS k, 'RESEG' AS seg FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW2' FROM customer WHERE c_custkey % 100 = 0),
closed2 AS (
  SELECT o.k, o.seg, o.f, CAST(3000000 AS BIGINT) AS t
  FROM open1 o JOIN u2 u ON o.k = u.k AND u.seg IS DISTINCT FROM o.seg),
open2 AS (
  SELECT o.k, o.seg, o.f
  FROM open1 o LEFT JOIN u2 u ON o.k = u.k
  WHERE u.k IS NULL OR u.seg IS NOT DISTINCT FROM o.seg
  UNION ALL
  SELECT u.k, u.seg, CAST(3000000 AS BIGINT)
  FROM u2 u LEFT JOIN open1 o ON o.k = u.k
  WHERE o.k IS NULL OR u.seg IS DISTINCT FROM o.seg)
SELECT k AS c_custkey, seg AS c_mktsegment, f AS valid_from_us,
       t AS valid_to_us, false AS is_current FROM closed1
UNION ALL
SELECT k, seg, f, t, false FROM closed2
UNION ALL
SELECT k, seg, f, NULL, true FROM open2
"""


@query("scd2_store_history", oracle=_SCD2_STORE_ORACLE)
def scd2_store_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch PERSISTED SCD2 store (sinks.scd2_store — the production
    shape of operators.scd2): init from `customer` at t0, two update
    batches through the open/closed store (batch 1 re-segments %7 and
    births %50 'NEW' keys; batch 2 re-segments %3 and re-updates the %100
    'NEW' keys to 'NEW2'), then the compaction pass folds the committed
    closed dirs, and read_history returns the full version chain.  Each
    apply reads ONLY the dimension-sized open slice; closed history is
    append-only; both slices commit atomically via staged renames.  The
    oracle derives the same two-batch history set-theoretically, so the
    driver row proves store writes + compaction == the in-memory chain
    bit-for-bit."""
    import shutil
    import tempfile

    from localsql_spark.sinks.scd2_store import (apply_batch,
                                                 compact_scd2_store,
                                                 init_store, read_history)

    t = load(spark, sf_dir)
    cust = t["customer"]
    key = F.col("c_custkey")
    u1 = (cust.filter(key % 7 == 0)
          .withColumn("c_mktsegment", F.lit("MIGRATED"))
          .unionByName(cust.filter(key % 50 == 0)
                       .withColumn("c_custkey", key + 1000000)
                       .withColumn("c_mktsegment", F.lit("NEW")))
          .select("c_custkey", "c_mktsegment"))
    u2 = (cust.filter(key % 3 == 0)
          .withColumn("c_mktsegment", F.lit("RESEG"))
          .unionByName(cust.filter(key % 100 == 0)
                       .withColumn("c_custkey", key + 1000000)
                       .withColumn("c_mktsegment", F.lit("NEW2")))
          .select("c_custkey", "c_mktsegment"))
    store = tempfile.mkdtemp(prefix="scd2_store_")
    try:
        dim = cust.select("c_custkey", "c_mktsegment")
        init_store(dim, store, ["c_custkey"], ["c_mktsegment"], 1_000_000)
        apply_batch(spark, store, u1, ["c_custkey"], ["c_mktsegment"],
                    2_000_000, batch_id=1)
        apply_batch(spark, store, u2, ["c_custkey"], ["c_mktsegment"],
                    3_000_000, batch_id=2)
        compact_scd2_store(spark, store)
        h = read_history(spark, store)
        out = h.select(
            "c_custkey", "c_mktsegment", "valid_from_us", "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"))
        # materialize before the store dir is removed (localCheckpoint
        # keeps the result independent of the temp files)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


_SCD2_EVOLUTION_ORACLE = """
WITH cur0 AS (SELECT c_custkey AS k, c_mktsegment AS seg,
                     CAST(NULL AS VARCHAR) AS tier
              FROM customer),
u1 AS (SELECT c_custkey AS k, 'MIGRATED' AS seg FROM customer
       WHERE c_custkey % 7 = 0),
closed1 AS (
  SELECT c.k, c.seg, c.tier,
         CAST(1000000 AS BIGINT) AS f, CAST(2000000 AS BIGINT) AS t
  FROM cur0 c JOIN u1 u ON c.k = u.k AND u.seg IS DISTINCT FROM c.seg),
open1 AS (
  SELECT c.k, c.seg, c.tier, CAST(1000000 AS BIGINT) AS f
  FROM cur0 c LEFT JOIN u1 u ON c.k = u.k
  WHERE u.k IS NULL OR u.seg IS NOT DISTINCT FROM c.seg
  UNION ALL
  SELECT u.k, u.seg, CAST(NULL AS VARCHAR), CAST(2000000 AS BIGINT)
  FROM u1 u JOIN cur0 c ON c.k = u.k
  WHERE u.seg IS DISTINCT FROM c.seg),
u2 AS (SELECT c_custkey AS k, 'RESEG' AS seg,
              'T' || CAST(c_custkey % 4 AS VARCHAR) AS tier
       FROM customer WHERE c_custkey % 3 = 0),
closed2 AS (
  SELECT o.k, o.seg, o.tier, o.f, CAST(3000000 AS BIGINT) AS t
  FROM open1 o JOIN u2 u
    ON o.k = u.k
   AND (u.seg IS DISTINCT FROM o.seg OR u.tier IS DISTINCT FROM o.tier)),
open2 AS (
  SELECT o.k, o.seg, o.tier, o.f
  FROM open1 o LEFT JOIN u2 u ON o.k = u.k
  WHERE u.k IS NULL OR (u.seg IS NOT DISTINCT FROM o.seg
                        AND u.tier IS NOT DISTINCT FROM o.tier)
  UNION ALL
  SELECT u.k, u.seg, u.tier, CAST(3000000 AS BIGINT)
  FROM u2 u JOIN open1 o ON o.k = u.k
  WHERE u.seg IS DISTINCT FROM o.seg OR u.tier IS DISTINCT FROM o.tier),
u3 AS (SELECT c_custkey AS k, 'OLDP' AS seg FROM customer
       WHERE c_custkey % 5 = 0),
closed3 AS (
  SELECT o.k, o.seg, o.tier, o.f, CAST(4000000 AS BIGINT) AS t
  FROM open2 o JOIN u3 u ON o.k = u.k AND u.seg IS DISTINCT FROM o.seg),
open3 AS (
  SELECT o.k, o.seg, o.tier, o.f
  FROM open2 o LEFT JOIN u3 u ON o.k = u.k
  WHERE u.k IS NULL OR u.seg IS NOT DISTINCT FROM o.seg
  UNION ALL
  SELECT u.k, u.seg, o.tier, CAST(4000000 AS BIGINT)
  FROM u3 u JOIN open2 o ON o.k = u.k
  WHERE u.seg IS DISTINCT FROM o.seg),
hist AS (
  SELECT k, seg, tier, f, t, false AS is_current FROM closed1
  UNION ALL SELECT k, seg, tier, f, t, false FROM closed2
  UNION ALL SELECT k, seg, tier, f, t, false FROM closed3
  UNION ALL SELECT k, seg, tier, f, CAST(NULL AS BIGINT), true FROM open3)
SELECT k AS c_custkey, seg AS c_mktsegment, tier AS c_tier,
       f AS valid_from_us, t AS valid_to_us, is_current
FROM hist WHERE k % 11 <> 0
"""


@query("scd2_evolution_probe", oracle=_SCD2_EVOLUTION_ORACLE)
def scd2_evolution_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution flowing END-TO-END through the
    persisted SCD2 store (verdict r12 task 2 — the sharpest store for
    evolution, since an as-of read must see ONE stable shape across the
    boundary): the customer dimension registers its contract
    (sinks/schema_evolution.py), folds a pre-evolution batch, EVOLVES
    to add ``c_tier``, folds a new-producer batch carrying it, then an
    OLD-producer batch without it — whose carried tier values come from
    the registry-driven CARRY-FORWARD (apply_batch joins the absent
    attribute from each key's current open version; padding NULL would
    have closed every current version and erased the evolved attribute)
    — compacts the closed dirs ACROSS the vintage boundary (explicit
    evolved-schema fold: a raw read would silently drop c_tier from the
    newer dirs), and erases the %11 subjects' whole version chains.
    The oracle derives the same three-batch evolved history
    set-theoretically on the evolved schema — the
    ``schema_evolution_probe`` rebuild discipline — so the driver row
    proves registered writes + carry-forward + cross-vintage compaction
    + erase == the from-scratch chain bit-for-bit."""
    import shutil
    import tempfile

    from localsql_spark.sinks.scd2_store import (apply_batch,
                                                 compact_scd2_store,
                                                 init_store, read_history,
                                                 scd2_erase_keys)
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    t = load(spark, sf_dir)
    cust = t["customer"]
    key = F.col("c_custkey")
    store = tempfile.mkdtemp(prefix="scd2_evo_")
    try:
        dim = cust.select("c_custkey", "c_mktsegment")
        init_store(dim, store, ["c_custkey"], ["c_mktsegment"], 1_000_000)
        init_schema(store, {"c_custkey": "bigint",
                            "c_mktsegment": "string",
                            "valid_from_us": "bigint",
                            "valid_to_us": "bigint"})
        u1 = (cust.filter(key % 7 == 0)
              .withColumn("c_mktsegment", F.lit("MIGRATED"))
              .select("c_custkey", "c_mktsegment"))
        apply_batch(spark, store, u1, ["c_custkey"], ["c_mktsegment"],
                    2_000_000, batch_id=1)
        evolve_schema(store, {"c_tier": "string"})
        u2 = (cust.filter(key % 3 == 0)
              .select("c_custkey", F.lit("RESEG").alias("c_mktsegment"),
                      F.concat(F.lit("T"), (key % 4).cast("string"))
                      .alias("c_tier")))
        apply_batch(spark, store, u2, ["c_custkey"],
                    ["c_mktsegment", "c_tier"], 3_000_000, batch_id=2)
        # old producer: no c_tier column, old attr list — carry-forward
        u3 = (cust.filter(key % 5 == 0)
              .select("c_custkey", F.lit("OLDP").alias("c_mktsegment")))
        apply_batch(spark, store, u3, ["c_custkey"], ["c_mktsegment"],
                    4_000_000, batch_id=3)
        compact_scd2_store(spark, store)
        scd2_erase_keys(spark, store,
                        cust.filter(key % 11 == 0).select("c_custkey"),
                        "c_custkey")
        h = read_history(spark, store)
        out = h.select(
            "c_custkey", "c_mktsegment", "c_tier", "valid_from_us",
            "valid_to_us", F.col("valid_to_us").isNull().alias("is_current"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


@query("histogram_equidepth_values", oracle="""
WITH s AS (
  SELECT CAST(value AS DOUBLE) AS v,
         CAST('0x' || substr(md5('qsk:' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
           AS rk
  FROM events WHERE value IS NOT NULL
  ORDER BY rk, v LIMIT 1024),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, rk) AS rn, count(*) OVER () AS n
  FROM s),
qs AS (SELECT i / 8.0 AS q FROM UNNEST(range(1, 8)) t(i)),
ed AS (SELECT v AS e FROM r JOIN qs
       ON rn = CAST(floor(q * (n - 1)) AS BIGINT) + 1),
b AS (SELECT CAST(value AS DOUBLE) AS v,
             (SELECT count(*) FROM ed WHERE CAST(value AS DOUBLE) > ed.e)
               AS bucket
      FROM events WHERE value IS NOT NULL)
SELECT CAST(bucket AS INT) AS bucket, count(*) AS n,
       min(v) AS min_v, max(v) AS max_v
FROM b GROUP BY 1
""")
def histogram_equidepth_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of events.value
    (operators.sketches.equidepth_histogram): 7 bucket edges from the
    portable bottom-k hash-rank quantile sketch, one row-local fold
    assignment on the scan, one 8-row groupBy.  The composition of two
    verified primitives stays exactly verifiable — the oracle replays the
    sketch sample, the edge selection, and the strict-greater bucket rule
    bit-for-bit.  The full-table distribution audit at 100 TB costs one
    scan + one bounded shuffle."""
    from localsql_spark.operators.sketches import equidepth_histogram

    ev = load(spark, sf_dir)["events"]
    return (equidepth_histogram(ev, "value", "event_id", n_buckets=8)
            .withColumn("bucket", F.col("bucket").cast("int")))


@query("orders_segment_asof", oracle="""
SELECT o_orderkey, o_custkey AS c_custkey,
       CASE WHEN o_custkey % 7 = 0
                 AND epoch_us(o_orderdate) >= 883612800000000
            THEN 'MIGRATED' ELSE c.c_mktsegment END AS c_mktsegment
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
""")
def orders_segment_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact enrichment as-of event time (operators.scd2.scd2_enrich_asof —
    the query SCD2 histories exist for): every order joined to the
    customer segment that was valid AT ITS ORDER DATE, against a history
    with one segment migration (keys %7 -> 'MIGRATED' on 1998-01-01).
    Orders before the migration keep the original segment even for
    migrated customers — exactly what joining the current dimension gets
    wrong.  One co-partitioned equi-join with the interval residual; the
    oracle derives the same answer from the base tables with a CASE on
    the boundary (valid_from inclusive)."""
    from localsql_spark.operators.scd2 import (scd2_apply, scd2_enrich_asof,
                                               scd2_init)

    t = load(spark, sf_dir)
    cust, orders = t["customer"], t["orders"]
    t0, t1 = 788_918_400_000_000, 883_612_800_000_000  # 1995/1998-01-01 UTC
    hist0 = scd2_init(cust, ["c_custkey"], ["c_mktsegment"], t0)
    updates = (cust.filter(F.col("c_custkey") % 7 == 0)
               .withColumn("c_mktsegment", F.lit("MIGRATED"))
               .select("c_custkey", "c_mktsegment"))
    hist1 = scd2_apply(hist0, updates, ["c_custkey"], ["c_mktsegment"], t1)
    facts = orders.select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"))
    return (scd2_enrich_asof(facts, hist1, ["c_custkey"], "od_us")
            .select("o_orderkey", "c_custkey", "c_mktsegment"))


@query("streaming_scd2_ingest", oracle=_SCD2_STORE_ORACLE)
def streaming_scd2_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC into the persisted SCD2 store, driver-gated
    end-to-end (streaming.stream_scd2_ingest): the two update batches of
    scd2_store_history arrive as an mtime-ordered file stream
    (maxFilesPerTrigger=1); each micro-batch applies as one store batch —
    Structured Streaming's stable batch ids compose with apply_batch's
    replay-by-batch-id idempotency into effectively-exactly-once
    dimension maintenance, version timestamps from a deterministic
    ts_for_batch (replay == byte-identical history).  Sharing
    scd2_store_history's exact oracle proves streamed ingest == batch
    maintenance == the set-theoretic two-batch derivation."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.sinks.scd2_store import init_store, read_history
    from localsql_spark.streaming.stream_scd2_ingest import stream_scd2_ingest

    t = load(spark, sf_dir)
    cust = t["customer"]
    key = F.col("c_custkey")
    u1 = (cust.filter(key % 7 == 0)
          .withColumn("c_mktsegment", F.lit("MIGRATED"))
          .unionByName(cust.filter(key % 50 == 0)
                       .withColumn("c_custkey", key + 1000000)
                       .withColumn("c_mktsegment", F.lit("NEW")))
          .select("c_custkey", "c_mktsegment"))
    u2 = (cust.filter(key % 3 == 0)
          .withColumn("c_mktsegment", F.lit("RESEG"))
          .unionByName(cust.filter(key % 100 == 0)
                       .withColumn("c_custkey", key + 1000000)
                       .withColumn("c_mktsegment", F.lit("NEW2")))
          .select("c_custkey", "c_mktsegment"))

    src_dir = (_CACHE_DIR.parent / "stream_scd2_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch1.parquet", "b_batch2.parquet")
        for name, batch in zip(names, (u1, u2)):
            tmp = tempfile.mkdtemp(prefix="scd2split_")
            batch.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch1.parquet")).schema
    store = tempfile.mkdtemp(prefix="scd2_stream_store_")
    ck = tempfile.mkdtemp(prefix="scd2_stream_ck_")
    try:
        init_store(cust.select("c_custkey", "c_mktsegment"), store,
                   ["c_custkey"], ["c_mktsegment"], 1_000_000)
        stream_scd2_ingest(
            spark, source_dir=str(src_dir), schema=schema, store_dir=store,
            key_cols=["c_custkey"], attr_cols=["c_mktsegment"],
            ts_for_batch=lambda b: 1_000_000 * (b + 2),
            checkpoint_dir=ck)
        h = read_history(spark, store)
        return (h.select(
            "c_custkey", "c_mktsegment", "valid_from_us", "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"))
            .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


@query("split_stratified_val_by_lang", oracle="""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substr(md5('strat:' ||
                          CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
                    doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN rn <= CAST(ceil(0.1 * n) AS BIGINT)
            THEN 'val' ELSE 'train' END AS split
FROM r
""")
def split_stratified_val_by_lang(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """EXACT stratified validation split: precisely ceil(10%) of every
    language's documents go to val — hash-mod splits (split_train_val_test
    above) only hit proportions in expectation, and a small stratum can
    land far off; evaluation sets need exact per-stratum allocation.
    Deterministic salted hash rank within each stratum ('strat:' salt —
    the sketches.QUANTILE_SALT independence discipline), per-stratum
    count via a bounded window, row-local threshold.  The rank filter is
    per-lang-partitioned (WindowGroupLimit territory, same shape as
    sample_per_lang_topk); one lang-key shuffle total."""
    from pyspark.sql.window import Window

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    rk = hash32(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(rk.asc(), F.col("doc_id").asc())
    wc = Window.partitionBy("lang")
    return (docs.select(
        "doc_id", "lang",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_n"))
        .select("doc_id", "lang",
                F.when(F.col("_rn") <= F.ceil(0.1 * F.col("_n"))
                       .cast("bigint"), "val")
                .otherwise("train").alias("split")))


_IVFPQ_DIST = ("CAST(SUM(CAST(round((sv.x - cb.y) * (sv.x - cb.y), 12)"
               " AS DECIMAL(28,12))) AS DOUBLE)")

_IVFPQ_ORACLE = f"""
WITH ev AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings),
cc AS (SELECT vec_id AS cell, p, x AS y FROM ev WHERE vec_id < 8),
cd AS (SELECT sv.vec_id, cb.cell, {_IVFPQ_DIST} AS dist
       FROM ev sv JOIN cc cb ON sv.p = cb.p
       GROUP BY 1, 2),
casg AS (SELECT vec_id, cell FROM (
           SELECT vec_id, cell,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cell) AS rn
           FROM cd) r WHERE rn = 1),
rv AS (SELECT ev.vec_id, a.cell, ev.p, ev.x - cc.y AS x
       FROM ev JOIN casg a ON ev.vec_id = a.vec_id
               JOIN cc ON cc.cell = a.cell AND cc.p = ev.p),
sv AS (SELECT vec_id, CAST(floor((p - 1) / 16) AS INT) AS s,
              ((p - 1) % 16) + 1 AS sp, x
       FROM rv),
seeds AS (SELECT s, vec_id - 8 AS code, sp, x AS y FROM sv
          WHERE vec_id >= 8 AND vec_id < 24),
d0 AS (SELECT sv.vec_id, sv.s, cb.code,
              CAST(SUM(CAST(round((sv.x - cb.y) * (sv.x - cb.y), 12)
                            AS DECIMAL(28,12))) AS DOUBLE) AS dist
       FROM sv JOIN seeds cb ON sv.s = cb.s AND sv.sp = cb.sp
       WHERE sv.vec_id >= 8
       GROUP BY 1, 2, 3),
a0 AS (SELECT vec_id, s, code FROM (
         SELECT vec_id, s, code,
                ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY dist, code) AS rn
         FROM d0) r WHERE rn = 1),
c1 AS (SELECT a0.s, a0.code, sv.sp,
              CAST(SUM(CAST(round(sv.x, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) / COUNT(*) AS y
       FROM sv JOIN a0 ON sv.vec_id = a0.vec_id AND sv.s = a0.s
       GROUP BY 1, 2, 3),
d1 AS (SELECT sv.vec_id, sv.s, cb.code,
              CAST(SUM(CAST(round((sv.x - cb.y) * (sv.x - cb.y), 12)
                            AS DECIMAL(28,12))) AS DOUBLE) AS dist
       FROM sv JOIN c1 cb ON sv.s = cb.s AND sv.sp = cb.sp
       GROUP BY 1, 2, 3),
codes AS (SELECT vec_id, s, code FROM (
            SELECT vec_id, s, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY dist, code) AS rn
            FROM d1) r WHERE rn = 1),
qprobe AS (SELECT vec_id AS query_id, cell FROM (
             SELECT vec_id, cell,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cell) AS rn
             FROM cd WHERE vec_id < 10) r WHERE rn <= 4),
qrv AS (SELECT q.query_id, q.cell, ev.p, ev.x - cc.y AS x
        FROM qprobe q JOIN ev ON ev.vec_id = q.query_id
             JOIN cc ON cc.cell = q.cell AND cc.p = ev.p),
qsv AS (SELECT query_id, cell, CAST(floor((p - 1) / 16) AS INT) AS s,
               ((p - 1) % 16) + 1 AS sp, x
        FROM qrv),
lut AS (SELECT sv.query_id, sv.cell, sv.s, cb.code,
               CAST(SUM(CAST(round((sv.x - cb.y) * (sv.x - cb.y), 12)
                             AS DECIMAL(28,12))) AS DOUBLE) AS d
        FROM qsv sv JOIN c1 cb ON sv.s = cb.s AND sv.sp = cb.sp
        GROUP BY 1, 2, 3, 4),
scored AS (SELECT l.query_id, c.vec_id AS neighbor_id,
                  round(CAST(SUM(CAST(round(l.d, 12) AS DECIMAL(28,12)))
                             AS DOUBLE), 9) AS adc_dist
           FROM codes c JOIN casg a ON a.vec_id = c.vec_id
                JOIN lut l ON l.cell = a.cell AND l.s = c.s
                          AND l.code = c.code
           WHERE l.query_id <> c.vec_id
           GROUP BY 1, 2)
SELECT query_id, neighbor_id, adc_dist, rn FROM (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rn
  FROM scored) r WHERE rn <= 5
"""


@query("knn_ivfpq_top5", oracle=_IVFPQ_ORACLE)
def knn_ivfpq_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (operators.similarity.knn_ivfpq_adc, Jégou et al. TPAMI
    2011 §V): coarse-quantize into 8 inverted lists, product-quantize the
    residual vector-centroid (m=4, 16 codes, one Lloyd round), probe the
    4 nearest lists per query with a per-(query, cell) ADC lookup table —
    the composition behind billion-scale ANN (IVF bounds what is scanned,
    PQ bounds bytes per scanned row; no shuffle carries float vectors).
    The oracle replays coarse assignment, residual computation, codebook
    training, encoding, probing, and LUT scoring in SQL, so the gate
    checks the full index pipeline, not just final ranks."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_ivfpq_adc(emb, emb.filter(F.col("vec_id") < 10), k=5,
                           n_cells=8, n_probe=4, m=4, k_codes=16,
                           n_iter=1, exclude_self=True)


@query("ivm_nation_revenue", oracle="""
SELECT c.c_nationkey AS grp,
       count(*) AS n_rows,
       round(CAST(sum(CAST(round(o.o_totalprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE), 6) AS sum_value,
       round(CAST(sum(CAST(round(o.o_totalprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE) / count(*), 6) AS avg_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""")
def ivm_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN-aggregate view (sinks.ivm): revenue
    by customer nation over orders ⋈ customer, built by folding three
    fact batches (hash-mod on o_orderkey) into a persisted view — each
    fold joins and aggregates ONLY the batch (the Δfact ⋈ dim delta
    rule; Gupta & Mumick 1995) and rewrites only the touched grp_bucket
    partitions via the manifest-committed swap.  The oracle recomputes
    the view from the full fact table, proving incremental maintenance
    == full recompute; avg derives at read time as sum/count.  Job cost
    tracks ingest-batch size, never fact-history size — the materialized-
    view shape a 100 TB fact store needs."""
    import shutil
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view

    t = load(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    scratch = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "ivm_nation_rev" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(scratch.parent / f".{scratch.name}.staging",
                  ignore_errors=True)
    m = F.pmod(hash32(F.col("o_orderkey").cast("string")), F.lit(3))
    for batch in (orders.filter(m == 0), orders.filter(m == 1),
                  orders.filter(m == 2)):
        maintain_join_view(spark, str(scratch), batch, customer,
                           fact_key="o_custkey", dim_key="c_custkey",
                           group_col="c_nationkey",
                           value_col="o_totalprice")
    v = read_join_view(spark, str(scratch))
    return v.select(
        "grp", "n_rows",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        F.round(F.col("sum_value").cast("double") / F.col("n_rows"), 6)
        .alias("avg_value"))


_ER_MATCH_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name) AS dist,
       round(1 - levenshtein(a.c_name, b.c_name)
                 / CAST(greatest(length(a.c_name), length(b.c_name))
                        AS DOUBLE), 9) AS sim
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


@query("er_customer_matches", oracle=_ER_MATCH_SQL)
def er_customer_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution stage 1 (operators.er.blocked_edit_matches,
    Fellegi-Sunter blocking + edit-distance matching): customers block on
    (nation, market segment), pairs within a block match when their names
    are within edit distance 1.  One equi-join on the block key — never a
    cross join — with JVM-side codegen levenshtein; cost is bounded by
    the largest block (cap-able via block_cap), the property that makes
    record linkage feasible at 100 TB."""
    cust = load(spark, sf_dir)["customer"]
    from localsql_spark.operators import er as ER

    return ER.blocked_edit_matches(
        cust, id_col="c_custkey", attr_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_dist=1)


@query("er_customer_entities", oracle=f"""
WITH RECURSIVE m AS ({_ER_MATCH_SQL}),
edges AS (SELECT id_a AS s, id_b AS t FROM m
          UNION SELECT id_b, id_a FROM m),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT reach.n, edges.t FROM reach JOIN edges ON edges.s = reach.r
),
cc AS (SELECT n, min(r) AS eid FROM reach GROUP BY n)
SELECT c.c_custkey AS id, COALESCE(cc.eid, c.c_custkey) AS entity_id
FROM customer c LEFT JOIN cc ON cc.n = c.c_custkey
""")
def er_customer_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution stage 2 (operators.er.resolve_entities): the
    edit-distance matches canonicalize through min-label-propagation
    connected components (entity id = smallest record id per cluster,
    diameter-bounded joins over match EDGES only), singletons resolving
    to themselves — every record gets exactly one entity id.  The oracle
    replays blocking, matching, AND the transitive closure in SQL."""
    cust = load(spark, sf_dir)["customer"]
    from localsql_spark.operators import er as ER

    matches = ER.blocked_edit_matches(
        cust, id_col="c_custkey", attr_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_dist=1)
    return ER.resolve_entities(cust, matches, id_col="c_custkey")


@query("er_sorted_neighborhood", oracle="""
WITH r AS (SELECT c_custkey AS id, c_name AS attr, c_nationkey AS blk,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_name, c_custkey) AS rnk
           FROM customer),
pairs AS (SELECT a.id AS ida, b.id AS idb, a.attr AS aa, b.attr AS ab
          FROM r a JOIN r b
            ON a.blk = b.blk AND b.rnk - a.rnk BETWEEN 1 AND 3)
SELECT least(ida, idb) AS id_a, greatest(ida, idb) AS id_b,
       levenshtein(aa, ab) AS dist,
       round(1 - levenshtein(aa, ab)
                 / CAST(greatest(length(aa), length(ab)) AS DOUBLE), 9)
         AS sim
FROM pairs WHERE levenshtein(aa, ab) <= 2
""")
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER candidates (operators.er.
    sorted_neighborhood_matches, Hernández-Stolfo SIGMOD 1995): customers
    sort by name within their nation block and only pairs within 4
    positions compare — the hot-block answer that KEEPS oversized blocks
    at O(|block| x window) comparisons where block_cap would drop them.
    The partner rank is an equi-join key, so the join emits exactly
    |records| x (window-1) candidates before the edit-distance gate."""
    cust = load(spark, sf_dir)["customer"]
    from localsql_spark.operators import er as ER

    return ER.sorted_neighborhood_matches(
        cust, id_col="c_custkey", attr_col="c_name",
        block_cols=["c_nationkey"], window=4, max_dist=2)


@query("ivm_dim_rebase", oracle="""
SELECT CASE WHEN c.c_custkey % 50 = 0 THEN (c.c_nationkey + 1) % 25
            ELSE c.c_nationkey END AS grp,
       count(*) AS n_rows,
       round(CAST(sum(CAST(round(o.o_totalprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE), 6) AS sum_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""")
def ivm_dim_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-change maintenance of the incrementally-maintained join
    view (sinks.ivm.apply_dim_change, the Gupta-Mumick counting
    algorithm's dim-side delta): after folding the full fact table, every
    50th customer MOVES to the next nation; the view is maintained by
    retracting those customers' facts from their old groups and re-adding
    them to the new ones — cost tracks the changed keys' fact rows, never
    view or history size.  The oracle recomputes the view from scratch
    against the post-change dimension, proving retract+re-add == full
    recompute (groups emptied by the retraction leave the view)."""
    import shutil
    from pathlib import Path

    from localsql_spark.sinks.ivm import (apply_dim_change,
                                          maintain_join_view,
                                          read_join_view)

    t = load(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    scratch = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "ivm_dim_rebase" / Path(sf_dir.rstrip("/")).name)
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(scratch.parent / f".{scratch.name}.staging",
                  ignore_errors=True)
    maintain_join_view(spark, str(scratch), orders, customer,
                       fact_key="o_custkey", dim_key="c_custkey",
                       group_col="c_nationkey", value_col="o_totalprice")
    changed = customer.filter(F.pmod(F.col("c_custkey"), F.lit(50)) == 0)
    apply_dim_change(
        spark, str(scratch), orders,
        old_dim_rows=changed.select("c_custkey", "c_nationkey"),
        new_dim_rows=changed.select(
            "c_custkey",
            F.pmod(F.col("c_nationkey") + 1, F.lit(25))
            .alias("c_nationkey")),
        fact_key="o_custkey", dim_key="c_custkey",
        group_col="c_nationkey", value_col="o_totalprice")
    v = read_join_view(spark, str(scratch))
    return v.select("grp", "n_rows",
                    F.round(F.col("sum_value").cast("double"), 6)
                    .alias("sum_value"))


@query("bm25_search_top10", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('table', 'join', 'window', 'hash') GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (SELECT tf.doc_id,
                  CAST(round(SUM(CAST(round(
                      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)
                         + 1.0) * tf * 2.2
                      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                      12) AS DECIMAL(28,12))), 9) AS DOUBLE) AS score
           FROM tf JOIN dfreq USING (term) JOIN doclen USING (doc_id)
                CROSS JOIN stats
           GROUP BY tf.doc_id)
SELECT doc_id, score, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored) r WHERE rk <= 10
""")
def bm25_search_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (operators.text.bm25_topk, Okapi weighting in
    the Lucene idf form): top-10 documents for a 4-term query — the
    targeted corpus-mining / hard-negative primitive next to the
    embedding kNN family.  The token stream filters to the query terms
    BEFORE any aggregation (the exchange carries matching postings only),
    df and corpus stats are tiny broadcasts, the per-doc reduce is the
    decimal-sum fold so term order can't perturb the double sum, and the
    top-k is TakeOrderedAndProject."""
    from localsql_spark.operators.text import bm25_topk

    docs = load(spark, sf_dir)["documents"]
    return bm25_topk(docs, ["table", "join", "window", "hash"], k=10)


@query("neardup_triangle_counts", oracle=f"""
WITH pairs AS ({_minhash_pairs_sql()}),
e AS (SELECT DISTINCT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
      FROM pairs WHERE doc_a <> doc_b),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
degs AS (SELECT n, count(*) AS deg
         FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) d
         GROUP BY 1),
cnt AS (SELECT n, count(*) AS n_tri
        FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri) t GROUP BY 1)
SELECT degs.n AS node, degs.deg, coalesce(cnt.n_tri, 0) AS n_tri
FROM degs LEFT JOIN cnt ON cnt.n = degs.n
""")
def neardup_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the MinHash-LSH near-dup graph
    (operators.graph.triangle_counts): the transitivity audit behind the
    duplicate clusters — triangle-rich neighborhoods are cliquish (single-
    linkage merging is safe), triangle-free chains are the risky
    transitive merges.  Degree-ordered orientation bounds wedge
    generation at m^1.5 whatever the hub degree; the oracle counts the
    same triangles via the canonical id-ordered 3-way self-join (the two
    orientations enumerate the identical triangle set, each exactly
    once)."""
    docs = load(spark, sf_dir)["documents"]
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    from localsql_spark.operators.graph import triangle_counts

    return triangle_counts(pairs)


@query("split_leakage_safe", oracle=f"""
WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, r) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT reach.n, edges.t FROM reach JOIN edges ON edges.s = reach.r
),
cc AS (SELECT n, min(r) AS cluster_id FROM reach GROUP BY n),
g AS (SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN cc ON cc.n = d.doc_id),
b AS (SELECT doc_id, group_id,
             CAST('0x' || substr(md5('split:'
                                     || CAST(group_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS bucket
      FROM g)
SELECT doc_id, group_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM b
""")
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split (operators.selection.leakage_safe_split):
    near-dup CLUSTERS hash into splits as a unit, so a val document can
    never have a near-copy in train — the eval-integrity guarantee the
    per-doc hash split can't give.  The oracle replays the LSH pairs,
    the transitive closure AND the salted group hash."""
    from localsql_spark.operators.selection import leakage_safe_split

    docs = load(spark, sf_dir)["documents"]
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    return leakage_safe_split(docs, pairs)


# the exact-rescore tail is the SAME surgery for every ADC-shortlist
# oracle: cut the final top-k SELECT off the ADC oracle and append the
# shortlist + decimal-summed cosine rescore (built once for PQ above)
_RERANK_TAIL = _PQ_RERANK_ORACLE[_PQ_RERANK_ORACLE.index(",\nshort AS ("):]

_IVFPQ_RERANK_ORACLE = _IVFPQ_ORACLE[:_IVFPQ_ORACLE.rindex(
    "SELECT query_id, neighbor_id, adc_dist, rn")] + _RERANK_TAIL


@query("knn_ivfpq_rerank_top5", oracle=_IVFPQ_RERANK_ORACLE)
def knn_ivfpq_rerank_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC shortlist (20) + exact cosine re-rank to top-5
    (operators.similarity.knn_ivfpq_rerank) — the full production ANN
    stack: the inverted-list prune bounds what is ADC-scored, the codes
    bound bytes per scanned row, and exactly |queries| x 20 candidate
    vectors stream through the broadcast re-rank join for the true
    metric.  The oracle replays coarse assignment, residual PQ training,
    encoding, probing, ADC shortlisting AND the decimal-summed cosine
    rescore."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_ivfpq_rerank(emb, emb.filter(F.col("vec_id") < 10), k=5,
                              shortlist=20, n_cells=8, n_probe=4, m=4,
                              k_codes=16, n_iter=1, exclude_self=True)


@query("neardup_clustering_coeff", oracle=f"""
WITH pairs AS ({_minhash_pairs_sql()}),
e AS (SELECT DISTINCT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
      FROM pairs WHERE doc_a <> doc_b),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
degs AS (SELECT n, count(*) AS deg
         FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) d
         GROUP BY 1),
cnt AS (SELECT n, count(*) AS n_tri
        FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri) t GROUP BY 1)
SELECT degs.n AS node, degs.deg, coalesce(cnt.n_tri, 0) AS n_tri,
       CASE WHEN degs.deg >= 2
            THEN round(2.0 * coalesce(cnt.n_tri, 0)
                       / (degs.deg * (degs.deg - 1)), 9)
            ELSE 0.0 END AS coeff
FROM degs LEFT JOIN cnt ON cnt.n = degs.n
""")
def neardup_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient over the near-dup graph
    (operators.graph.clustering_coefficients, Watts-Strogatz): c~1 nodes
    sit in cliquish duplicate neighborhoods where single-linkage merging
    is safe, c~0 nodes are the chain/star joints where transitive merges
    are guesses — the per-node form of the transitivity audit, one
    row-local expression over the triangle counts."""
    docs = load(spark, sf_dir)["documents"]
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    from localsql_spark.operators.graph import clustering_coefficients

    return clustering_coefficients(pairs)


@query("er_fs_match_scores", oracle="""
WITH r AS (SELECT c_custkey AS id, c_name AS attr, c_nationkey AS blk,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_name, c_custkey) AS rnk
           FROM customer),
cand AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
         FROM r a JOIN r b
           ON a.blk = b.blk AND b.rnk - a.rnk BETWEEN 1 AND 3
         WHERE levenshtein(a.attr, b.attr) <= 2),
c2 AS (SELECT c_custkey, c_mktsegment,
              CAST(floor(c_acctbal / 100) AS INT) AS bal_band
       FROM customer),
nn AS (SELECT count(*) AS n FROM customer),
u1 AS (SELECT CAST(sum(g.n * g.n) AS DOUBLE)
              / CAST((SELECT n FROM nn) * (SELECT n FROM nn) AS DOUBLE)
         AS u
       FROM (SELECT count(*) AS n FROM customer
             GROUP BY c_mktsegment) g),
u2 AS (SELECT CAST(sum(g.n * g.n) AS DOUBLE)
              / CAST((SELECT n FROM nn) * (SELECT n FROM nn) AS DOUBLE)
         AS u
       FROM (SELECT count(*) AS n FROM c2 GROUP BY bal_band) g)
SELECT cand.id_a, cand.id_b,
       (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END
        + CASE WHEN a.bal_band = b.bal_band THEN 1 ELSE 0 END) AS n_agree,
       round(
         (CASE WHEN a.c_mktsegment = b.c_mktsegment
               THEN ln(CAST(0.9 AS DOUBLE) / u1.u)
               ELSE ln((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
                       / (CAST(1.0 AS DOUBLE) - u1.u)) END)
         + (CASE WHEN a.bal_band = b.bal_band
                 THEN ln(CAST(0.9 AS DOUBLE) / u2.u)
                 ELSE ln((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
                         / (CAST(1.0 AS DOUBLE) - u2.u)) END), 9)
         AS score
FROM cand JOIN c2 a ON a.c_custkey = cand.id_a
          JOIN c2 b ON b.c_custkey = cand.id_b
          CROSS JOIN u1 CROSS JOIN u2
""")
def er_fs_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic scoring (operators.er.fs_match_scores)
    over the sorted-neighborhood candidates: agreement on the ~100-value
    account-balance band outweighs agreement on the 5-value market
    segment because the
    weights are ln(m/u) with u = the field's value-collision probability
    estimated from the data — attribute EVIDENCE, not attribute counting.
    u per field is one tiny broadcast aggregate; scoring is row-local
    fixed-order double arithmetic over the blocked candidate list."""
    cust = load(spark, sf_dir)["customer"]
    from localsql_spark.operators import er as ER

    cand = ER.sorted_neighborhood_matches(
        cust, id_col="c_custkey", attr_col="c_name",
        block_cols=["c_nationkey"], window=4, max_dist=2)
    c2 = cust.withColumn("bal_band",
                         F.floor(F.col("c_acctbal") / 100).cast("int"))
    return ER.fs_match_scores(c2, cand, id_col="c_custkey",
                              fields=["c_mktsegment", "bal_band"], m=0.9)


@query("er_entities_multipass", oracle=f"""
WITH RECURSIVE m1 AS ({_ER_MATCH_SQL}),
r AS (SELECT c_custkey AS id, c_name AS attr, c_nationkey AS blk,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_name, c_custkey) AS rnk
      FROM customer),
m2 AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
       FROM r a JOIN r b
         ON a.blk = b.blk AND b.rnk - a.rnk BETWEEN 1 AND 3
       WHERE levenshtein(a.attr, b.attr) <= 1),
m AS (SELECT id_a, id_b FROM m1 UNION SELECT id_a, id_b FROM m2),
edges AS (SELECT id_a AS s, id_b AS t FROM m
          UNION SELECT id_b, id_a FROM m),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, r2) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT reach.n, edges.t FROM reach JOIN edges ON edges.s = reach.r2
),
cc AS (SELECT n, min(r2) AS eid FROM reach GROUP BY n)
SELECT c.c_custkey AS id, COALESCE(cc.eid, c.c_custkey) AS entity_id
FROM customer c LEFT JOIN cc ON cc.n = c.c_custkey
""")
def er_entities_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass entity resolution (the Hernández-Stolfo recall
    recovery): the UNION of two candidate passes — exhaustive matching
    within (nation, segment) blocks AND sorted-neighborhood within the
    coarser nation blocks — feeds one transitive canonicalization, so
    pairs either pass alone would miss still merge.  Both passes share
    the (id_a, id_b) pair shape, making the union a distinct over two
    bounded candidate streams; the closure cost still tracks total match
    count, not record count."""
    cust = load(spark, sf_dir)["customer"]
    from localsql_spark.operators import er as ER

    m1 = ER.blocked_edit_matches(
        cust, id_col="c_custkey", attr_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_dist=1)
    m2 = ER.sorted_neighborhood_matches(
        cust, id_col="c_custkey", attr_col="c_name",
        block_cols=["c_nationkey"], window=4, max_dist=1)
    matches = (m1.select("id_a", "id_b")
               .unionByName(m2.select("id_a", "id_b")).distinct())
    return ER.resolve_entities(cust, matches, id_col="c_custkey")


@query("streaming_ivm_ingest", oracle="""
SELECT c.c_nationkey AS grp,
       count(*) AS n_rows,
       round(CAST(sum(CAST(round(o.o_totalprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE), 6) AS sum_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""")
def streaming_ivm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the JOIN-aggregate view, driver-gated
    end-to-end (streaming.stream_ivm_ingest): orders arrive as three
    micro-batches (hash-mod split, mtime-ordered, maxFilesPerTrigger=1);
    each lands in an idempotent per-batch dir, then folds through the
    customer join into the persisted view under an applied marker —
    batch-sized Δfact ⋈ dim cost per fold, touched-bucket swap.
    Algebraic aggregates are batching-independent, so the whole-table
    batch SQL is an EXACT oracle: streamed maintenance == full
    recompute, the invariance a materialized view under a stream must
    prove."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.ivm import read_join_view
    from localsql_spark.streaming.stream_ivm_ingest import stream_ivm_ingest

    t = load(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    src_dir = (_CACHE_DIR.parent / "stream_ivm_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="isplit_")
            (orders.filter(hash32(F.col("o_orderkey")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="stream_ivm_"))
    stream_ivm_ingest(
        spark, source_dir=str(src_dir), schema=schema,
        land_dir=str(scratch / "land"), view_dir=str(scratch / "view"),
        checkpoint_dir=str(scratch / "ck"), dim=customer,
        fact_key="o_custkey", dim_key="c_custkey",
        group_col="c_nationkey", value_col="o_totalprice")
    v = read_join_view(spark, str(scratch / "view"))
    out = (v.select("grp", "n_rows",
                    F.round(F.col("sum_value").cast("double"), 6)
                    .alias("sum_value"))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("knn_ivfpq_index_top5", oracle=_IVFPQ_ORACLE)
def knn_ivfpq_index_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC against the PERSISTED codes index
    (operators.similarity.write_ivfpq_index / knn_ivfpq_from_index): the
    billion-scale serving shape — coarse assignment, residual PQ
    training and encoding paid once at write time, the stored index is
    the m-rows-per-vector (neighbor_id, s, code) table partitioned by
    cell, and each query batch reads two tiny model tables plus ONLY its
    probed cells' codes partitions (PartitionFilters plan-asserted); no
    float vector is read at query time.  Identical results to
    knn_ivfpq_top5 (shared oracle)."""
    import shutil
    from pathlib import Path

    emb = load(spark, sf_dir)["embeddings"]
    # build-once fixture, probe per call — the daily-loop steady state,
    # same framing as dedup_incremental_store's signature-store fixture
    index = (Path(__file__).resolve().parent.parent.parent / ".cache"
             / "ivfpq_index" / Path(sf_dir.rstrip("/")).name)
    marker = index / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(index, ignore_errors=True)
        S.write_ivfpq_index(emb, str(index), n_cells=8, m=4, k_codes=16,
                            n_iter=1)
        marker.touch()
    return S.knn_ivfpq_from_index(spark, str(index),
                                  emb.filter(F.col("vec_id") < 10), k=5,
                                  n_probe=4, exclude_self=True)


_NB_ORACLE = r"""
WITH lab AS (SELECT doc_id,
        CAST(substr(source, 4) AS INT) < 5 AS is_pos,
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM documents),
w AS (SELECT doc_id, is_pos, word
      FROM lab, UNNEST(string_split(t, ' ')) u(word)
      WHERE word <> ''),
cnt AS (SELECT word,
          count(*) FILTER (WHERE is_pos) AS cp,
          count(*) FILTER (WHERE NOT is_pos) AS cn
        FROM w GROUP BY 1),
tot AS (SELECT SUM(cp) AS tp, SUM(cn) AS tn, count(*) AS v FROM cnt),
lr AS (SELECT word,
          CAST(round((log10((cp + 1.0) / (tp + v))
                      - log10((cn + 1.0) / (tn + v))) * 1e9)
               AS BIGINT) AS lr_e9
       FROM cnt, tot),
pri AS (SELECT CAST(round(log10(
            CAST(count(*) FILTER (WHERE is_pos) AS DOUBLE)
            / count(*) FILTER (WHERE NOT is_pos)) * 1e9)
          AS BIGINT) AS prior_e9 FROM lab),
unseen AS (SELECT CAST(round((log10(1.0 / (tp + v))
                              - log10(1.0 / (tn + v))) * 1e9)
             AS BIGINT) AS unseen_e9 FROM tot),
s AS (SELECT doc_id, count(*) AS n_tokens,
             SUM(COALESCE(lr_e9, unseen_e9)) AS lrsum
      FROM w LEFT JOIN lr USING (word) CROSS JOIN unseen GROUP BY 1)
SELECT l.doc_id, l.is_pos,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       round(CAST(COALESCE(s.lrsum, 0) + p.prior_e9 AS DOUBLE) / 1e9, 9)
         AS nb_score,
       (COALESCE(s.lrsum, 0) + p.prior_e9) > 0 AS pred_pos
FROM lab l LEFT JOIN s USING (doc_id) CROSS JOIN pri p
"""


@query("quality_nb_seed_scores", oracle=_NB_ORACLE)
def quality_nb_seed_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality classifier (operators.selection.nb_seed_scores):
    multinomial Naive Bayes trained on a seed labeling (curated sources
    src0-src4 positive vs the rest — the same source tiers
    mix_sources_weighted up-weights) and applied to every document.  The
    GPT-3-style "train a filter on seed corpora, score the crawl" step
    (arXiv:2005.14165 App. A) as two shuffles: one vocabulary-bounded
    groupBy(word) to fit both class distributions, one word-key join +
    per-doc aggregate to score.  Laplace smoothing; per-word log-ratios
    are fixed-point e9 longs summed exactly; the sign test (pred_pos)
    compares the exact integer sum."""
    from localsql_spark.operators.selection import nb_seed_scores

    docs = load(spark, sf_dir)["documents"]
    is_pos = F.substring("source", 4, 10).cast("int") < 5
    return nb_seed_scores(docs, is_pos)


@query("quality_nb_incremental", oracle=_NB_ORACLE)
def quality_nb_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-trained NB quality model (operators.selection.
    nb_model_update): the historical corpus (doc_id % 10 != 0) folds
    into a persisted count store first, the daily delta (doc_id % 10 ==
    0) folds second — cost = batch tokenization + a vocabulary-sized
    merge, never a historical re-read — then every document scores
    against the read-back model.  Counts are additive, so two folds ==
    one full-train pass EXACTLY, proven by sharing
    quality_nb_seed_scores' full-corpus oracle bit-for-bit.  Store
    commits are the shared staged-write + manifest-rename protocol."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_model_update,
                                                    nb_score_with_model)

    docs = load(spark, sf_dir)["documents"]
    is_pos = F.substring("source", 4, 10).cast("int") < 5
    scratch = Path(tempfile.mkdtemp(prefix="nb_model_"))
    model_dir = str(scratch / "model")
    nb_model_update(spark, model_dir, docs.filter(F.col("doc_id") % 10 != 0),
                    is_pos)
    nb_model_update(spark, model_dir, docs.filter(F.col("doc_id") % 10 == 0),
                    is_pos)
    model, doc_counts = nb_model_read(spark, model_dir)
    out = (nb_score_with_model(docs, model, doc_counts, is_pos)
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("streaming_nb_ingest", oracle=_NB_ORACLE)
def streaming_nb_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the persisted NB quality model, driver-
    gated end-to-end (streaming.stream_nb_ingest): documents arrive as
    three micro-batches (hash-mod split, mtime-ordered,
    maxFilesPerTrigger=1); each lands in an idempotent per-batch dir,
    then folds its ADDITIVE token counts into the model store under an
    applied marker — the marker, not the store write, carries
    exactly-once because re-applying an additive fold double-counts.
    Because the folds are exact, the streamed model scores the corpus
    bit-identically to a single full-train pass — this query shares
    quality_nb_seed_scores' whole-corpus oracle."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_score_with_model)
    from localsql_spark.streaming.stream_nb_ingest import stream_nb_ingest

    docs = load(spark, sf_dir)["documents"]
    is_pos = F.substring("source", 4, 10).cast("int") < 5
    src_dir = (_CACHE_DIR.parent / "stream_nb_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="nbsplit_")
            (docs.filter(hash32(F.col("doc_id")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="stream_nb_"))
    stream_nb_ingest(
        spark, source_dir=str(src_dir), schema=schema,
        land_dir=str(scratch / "land"), model_dir=str(scratch / "model"),
        checkpoint_dir=str(scratch / "ck"), positive=is_pos)
    model, doc_counts = nb_model_read(spark, str(scratch / "model"))
    out = (nb_score_with_model(docs, model, doc_counts, is_pos)
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("compact_documents_roundtrip", oracle="""
SELECT source, count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       count(DISTINCT md5(text)) AS n_distinct_texts
FROM documents
GROUP BY source
""")
def compact_documents_roundtrip(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """Small-file compaction, driver-gated for content preservation
    (sinks.layout.compact_parquet): the documents table is scattered
    into 64 tiny files (the streaming-ingest debris shape that kills
    scan planning at 100 TB — every file costs a footer read, a task
    and a scheduler slot), compacted into target-size files via the
    staged-rewrite + two-rename swap (crash states heal on the next
    run, test_compact_parquet_recovers_from_crash_states), then read
    back and aggregated — the oracle aggregates the ORIGINAL table, so
    the query proves the rewrite preserved every row and byte of text.
    The compaction rewrite itself is shuffle-free (coalesce)."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.sinks.layout import compact_parquet

    docs = load(spark, sf_dir)["documents"]
    scratch = Path(tempfile.mkdtemp(prefix="compact_rt_"))
    t = scratch / "docs"
    docs.repartition(64).write.mode("overwrite").parquet(str(t))
    n_before = len(list(t.glob("*.parquet")))
    n_after = compact_parquet(spark, t, target_mb=128)
    assert n_after < n_before, (n_before, n_after)
    back = spark.read.parquet(str(t))
    out = (back.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
                F.countDistinct(F.md5("text")).alias("n_distinct_texts"))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("bloom_filtered_orders_join", oracle="""
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
GROUP BY o_orderpriority
""")
def bloom_filtered_orders_join(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """The RUNTIME-FILTER join pattern made explicit and portable
    (operators.sketches.bloom_build/bloom_probe — same discipline as
    decontaminate_bloom, applied to the relational star join): the
    selective customer predicate compresses into a Bloom bit table
    (<= min(K*n, m) rows, broadcastable at any scale), the orders FACT
    side prefilters against it map-side — K broadcast joins over its
    distinct keys, the full fact mass is never shuffled — and the tiny
    surviving candidate set pays the exact dim join that removes the
    filter's false positives.  Sharing the plain-join oracle proves
    prefilter + exact-verify == the unfiltered join.  Spark's own AQE
    runtime bloom (spark.sql.optimizer.runtime.bloomFilter) fires on
    cost heuristics and its bit layout is JVM-internal; this one is
    deterministic, engine-portable, and always on.  Sums go through
    DECIMAL so partial-aggregation order cannot perturb low bits."""
    from localsql_spark.operators.sketches import bloom_build, bloom_probe

    t = load(spark, sf_dir)
    dim = (t["customer"]
           .filter((F.col("c_mktsegment") == "BUILDING")
                   & (F.col("c_acctbal") > 9000))
           .select("c_custkey"))
    m = 1 << 20
    bits = bloom_build(dim, "c_custkey", m=m)
    cand = bloom_probe(bits, t["orders"], "o_custkey", m=m)
    return (cand.join(dim, cand["o_custkey"] == dim["c_custkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_price")))


@query("cobucket_join_segment_revenue", oracle="""
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def cobucket_join_segment_revenue(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """Shuffle-free co-located join, driver-gated (sinks.bucketing): both
    join sides persist bucketed on the customer key — the star-schema
    shuffle paid ONCE at write time — and the join itself plans with no
    Exchange on either side (plan pinned by
    test_cobucketed_join_has_no_exchange; the only shuffle left is the
    tiny per-segment aggregate).  The plain-join oracle proves bucketed
    == unbucketed results.  Table names are sf-scoped so scale factors
    never collide in the warehouse."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    from localsql_spark.sinks.bucketing import write_bucketed

    t = load(spark, sf_dir)
    sfn = Path(sf_dir.rstrip("/")).name.replace(".", "_")
    lname, rname = f"orders_bkt_{sfn}", f"customer_bkt_{sfn}"
    # a fresh session's in-memory catalog does not know a previous
    # session's managed-table location — drop BOTH the entry and the
    # orphaned dir so the write is idempotent across driver sessions
    wh = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    for name in (lname, rname):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(wh / name, ignore_errors=True)
    write_bucketed(t["orders"].select("o_custkey", "o_totalprice"),
                   lname, ["o_custkey"], n_buckets=16)
    write_bucketed(t["customer"].select("c_custkey", "c_mktsegment"),
                   rname, ["c_custkey"], n_buckets=16)
    # cobucket_join takes same-name key lists; the TPC-H sides keep their
    # o_/c_ prefixes, so join by the explicit equality (same plan shape)
    j = spark.table(lname).join(spark.table(rname),
                                F.col("o_custkey") == F.col("c_custkey"))
    return (j.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_price")))


@query("hybrid_search_top10", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'hash', 'vector') GROUP BY 1, 2),
idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
       CAST(round(SUM(CAST(round(
         ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
         * tf * 2.2
         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 12)
         AS DECIMAL(28,12))), 9) AS DOUBLE) AS bm25_score
       FROM tf JOIN idf USING (term) JOIN doclen USING (doc_id)
       CROSS JOIN stats GROUP BY tf.doc_id),
short AS (SELECT doc_id, bm25_score FROM bm
          ORDER BY bm25_score DESC, doc_id LIMIT 50),
qe AS (SELECT generate_subscripts(embedding, 1) AS p,
              unnest(embedding) AS x
       FROM embeddings WHERE vec_id = 0),
qn AS (SELECT sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE)
                 * CAST(x AS DOUBLE), 12) AS DECIMAL(38,12)))
                 AS DOUBLE)) AS nq FROM qe),
ce AS (SELECT s.doc_id, s.bm25_score,
              generate_subscripts(e.embedding, 1) AS p,
              unnest(e.embedding) AS y
       FROM short s JOIN embeddings e ON e.vec_id = s.doc_id),
dots AS (SELECT doc_id, any_value(bm25_score) AS bm25_score,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE)
                  * CAST(y AS DOUBLE), 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS dotp,
                sqrt(CAST(SUM(CAST(round(CAST(y AS DOUBLE)
                  * CAST(y AS DOUBLE), 12) AS DECIMAL(38,12)))
                  AS DOUBLE)) AS nc
         FROM ce JOIN qe USING (p) GROUP BY doc_id),
scored AS (SELECT doc_id, bm25_score,
                  round(dotp / (nq * nc), 9) AS cos_sim
           FROM dots CROSS JOIN qn)
SELECT doc_id, bm25_score, cos_sim,
       CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS INT) AS rk
FROM scored
ORDER BY cos_sim DESC, doc_id LIMIT 10
""")
def hybrid_search_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval (operators.similarity.
    hybrid_bm25_cosine_topk): BM25 over the inverted index shortlists 50
    candidates for the query bag ('join hash vector') without touching a
    vector, then embedding cosine against the vec_id-0 query vector
    re-ranks ONLY the shortlist — the production RAG shape, where the
    expensive vector math is shortlist-sized however large the corpus.
    The oracle replays both stages end-to-end (BM25 decimal folds,
    shortlist cut, decimal cosine, final rank)."""
    from localsql_spark.operators.similarity import hybrid_bm25_cosine_topk

    t = load(spark, sf_dir)
    return hybrid_bm25_cosine_topk(t["documents"], t["embeddings"],
                                   ["join", "hash", "vector"],
                                   query_vec_id=0, shortlist=50, k=10)


@query("hard_negatives_top10", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('join', 'hash', 'vector') GROUP BY 1, 2),
idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
       CAST(round(SUM(CAST(round(
         ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
         * tf * 2.2
         / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 12)
         AS DECIMAL(28,12))), 9) AS DOUBLE) AS bm25_score
       FROM tf JOIN idf USING (term) JOIN doclen USING (doc_id)
       CROSS JOIN stats GROUP BY tf.doc_id),
short AS (SELECT doc_id, bm25_score FROM bm
          ORDER BY bm25_score DESC, doc_id LIMIT 50),
qe AS (SELECT generate_subscripts(embedding, 1) AS p,
              unnest(embedding) AS x
       FROM embeddings WHERE vec_id = 0),
qn AS (SELECT sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE)
                 * CAST(x AS DOUBLE), 12) AS DECIMAL(38,12)))
                 AS DOUBLE)) AS nq FROM qe),
ce AS (SELECT s.doc_id, s.bm25_score,
              generate_subscripts(e.embedding, 1) AS p,
              unnest(e.embedding) AS y
       FROM short s JOIN embeddings e ON e.vec_id = s.doc_id),
dots AS (SELECT doc_id, any_value(bm25_score) AS bm25_score,
                CAST(SUM(CAST(round(CAST(x AS DOUBLE)
                  * CAST(y AS DOUBLE), 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS dotp,
                sqrt(CAST(SUM(CAST(round(CAST(y AS DOUBLE)
                  * CAST(y AS DOUBLE), 12) AS DECIMAL(38,12)))
                  AS DOUBLE)) AS nc
         FROM ce JOIN qe USING (p) GROUP BY doc_id),
scored AS (SELECT doc_id, bm25_score,
                  round(dotp / (nq * nc), 9) AS cos_sim
           FROM dots CROSS JOIN qn
           WHERE round(dotp / (nq * nc), 9) <= 0.25)
SELECT doc_id, bm25_score, cos_sim,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id) AS INT)
         AS rk
FROM scored
ORDER BY bm25_score DESC, doc_id LIMIT 10
""")
def hard_negatives_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retriever training
    (operators.similarity.bm25_hard_negatives, the DPR recipe
    arXiv:2004.04906 §3.2): BM25-shortlisted candidates — lexically
    confusable with the query — whose cosine to the query vector is
    <= 0.25, ranked by lexical score.  Random negatives teach a dense
    retriever nothing; these are the examples it must learn to push
    away.  Same shortlist-bounded vector cost and engine-exact
    determinism as hybrid_search_top10; the oracle replays shortlist,
    cosine, threshold and rank."""
    from localsql_spark.operators.similarity import bm25_hard_negatives

    t = load(spark, sf_dir)
    return bm25_hard_negatives(t["documents"], t["embeddings"],
                               ["join", "hash", "vector"],
                               query_vec_id=0, shortlist=50, k=10,
                               max_cos=0.25)


@query("erase_users_events", oracle="""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
         AS sum_value
FROM events
WHERE user_id NOT IN (1, 2, 3)
GROUP BY event_type
""")
def erase_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten erasure, driver-gated (sinks.erase): events
    persist into a user-hash-bucketed store, a 3-user deletion request
    erases — touched buckets computed FROM THE KEYS alone (never a store
    scan), partition-pruned read, broadcast anti join, manifest-committed
    rewrite — and the read-back aggregate must equal the oracle's
    NOT IN over the original table: the erased users' bytes are gone,
    everyone else's are intact.  Erasure cost tracks the deletion
    request (<= min(K, n_buckets) bucket rewrites), not the store."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.sinks.erase import (erase_keys, read_bucketed_store,
                                            write_bucketed_store)

    ev = load(spark, sf_dir)["events"]
    scratch = Path(tempfile.mkdtemp(prefix="erase_rt_"))
    store = str(scratch / "events_by_user")
    write_bucketed_store(ev, store, "user_id", n_buckets=32)
    keys = spark.createDataFrame([(1,), (2,), (3,)], "user_id long")
    erase_keys(spark, store, keys, "user_id", n_buckets=32)
    back = read_bucketed_store(spark, store)
    out = (back.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(F.round("value", 6).cast("decimal(28,6)"))
                .cast("double").alias("sum_value"))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("pseudonymize_events", oracle="""
WITH anon AS (SELECT md5('s4lt' || CAST(user_id AS VARCHAR)) AS token,
                     event_type, value
              FROM events)
SELECT token, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
         AS sum_value
FROM anon
GROUP BY token, event_type
ORDER BY n_events DESC, token, event_type LIMIT 100
""")
def pseudonymize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization for analytics sharing (sinks.erase.pseudonymize):
    events split into an analytics copy keyed by a salted md5 token
    (deterministic, so token-joins still work; portable, so the oracle
    replays it) plus a separately-governed vault for authorized
    re-identification.  Paired with erase_keys, subject erasure =
    vault-row delete + token-store erase, after which the token is
    unlinkable.  The gate aggregates the ANONYMIZED stream — proving
    per-subject analytics survive with no raw identifier in the output;
    top-100 by activity, ties broken on token."""
    from localsql_spark.sinks.erase import pseudonymize

    ev = load(spark, sf_dir)["events"]
    anon, vault = pseudonymize(ev.select("user_id", "event_type", "value"),
                               "user_id", salt="s4lt")
    return (anon.groupBy("token", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round("value", 6).cast("decimal(28,6)"))
                 .cast("double").alias("sum_value"))
            .orderBy(F.col("n_events").desc(), "token", "event_type")
            .limit(100))


@query("k_anonymity_events", oracle="""
SELECT event_type,
       CAST(hour(ts) AS BIGINT) AS hour_of_day,
       count(*) AS class_size,
       count(*) < 5 AS at_risk
FROM events
GROUP BY 1, 2
""")
def k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (sinks.erase.k_anonymity_audit, Sweeney's
    notion): equivalence-class sizes over a quasi-identifier pair
    (event_type x a coarse time bucket), flagging classes below k=5 —
    the pre-release check pseudonymization alone cannot replace, since
    quasi-identifiers can single a subject out with no identifier
    present.  One QI-key groupBy with map-side combine; result bounded
    by class count at any scale."""
    from localsql_spark.sinks.erase import k_anonymity_audit

    ev = load(spark, sf_dir)["events"]
    qi = ev.select("event_type",
                   F.hour("ts").cast("long").alias("hour_of_day"))
    return k_anonymity_audit(qi, ["event_type", "hour_of_day"], k=5)


@query("change_feed_documents", oracle="""
WITH base AS (SELECT doc_id, lang, text, 1 AS version FROM documents),
upd AS (
  SELECT doc_id, lang, concat('v2 ', text) AS text, 2 AS version
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 7 = 0
  UNION ALL
  SELECT doc_id, lang, text, 0 AS version  -- stale: must emit nothing
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000, lang, concat('new ', text), 1
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 11 = 0),
winner AS (
  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY version DESC) AS rn FROM upd) z WHERE rn = 1)
SELECT w.doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'insert' ELSE 'update' END AS op,
       w.lang AS new_lang, md5(w.text) AS new_text_md5,
       CAST(w.version AS INT) AS new_version,
       b.lang AS old_lang, md5(b.text) AS old_text_md5,
       CAST(b.version AS INT) AS old_version
FROM winner w LEFT JOIN base b USING (doc_id)
WHERE b.doc_id IS NULL OR w.version > b.version
""")
def change_feed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed from the merge sink (sinks.merge.change_feed —
    the PRODUCING direction of CDC; the SCD2 store consumes one): for a
    correction batch against the documents base (1/7 re-texted at v2,
    1/11 new keys, 1/5 redelivered STALE at v0), emit exactly the
    APPLIED changes — inserts with NULL old-side, updates with old+new —
    while stale and same-version rows emit NOTHING (redelivering an
    applied batch produces an empty feed), which is what makes
    consuming the feed idempotent.  Batch-windowed winner +
    one key join; text surfaces as md5 for compact hashing."""
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.merge import change_feed

    docs = load(spark, sf_dir)["documents"]
    base = docs.select("doc_id", "lang", "text",
                       F.lit(1).cast("int").alias("version"))
    upd = (docs.filter(hash32(F.col("doc_id")) % 7 == 0)
           .select("doc_id", "lang",
                   F.concat(F.lit("v2 "), F.col("text")).alias("text"),
                   F.lit(2).cast("int").alias("version"))
           .unionByName(
               docs.filter(hash32(F.col("doc_id")) % 5 == 0)
               .select("doc_id", "lang", "text",
                       F.lit(0).cast("int").alias("version")))
           .unionByName(
               docs.filter(hash32(F.col("doc_id")) % 11 == 0)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       "lang",
                       F.concat(F.lit("new "), F.col("text")).alias("text"),
                       F.lit(1).cast("int").alias("version"))))
    feed = change_feed(base, upd, key="doc_id", version="version")
    return feed.select(
        "doc_id", "op", "new_lang",
        F.md5("new_text").alias("new_text_md5"), "new_version",
        "old_lang", F.md5("old_text").alias("old_text_md5"), "old_version")


@query("bm25_index_top10", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('table', 'join', 'window', 'hash') GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (SELECT tf.doc_id,
                  CAST(round(SUM(CAST(round(
                      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)
                         + 1.0) * tf * 2.2
                      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                      12) AS DECIMAL(28,12))), 9) AS DOUBLE) AS score
           FROM tf JOIN dfreq USING (term) JOIN doclen USING (doc_id)
                CROSS JOIN stats
           GROUP BY tf.doc_id)
SELECT doc_id, score, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored) r WHERE rk <= 10
""")
def bm25_index_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the PERSISTED inverted index
    (sinks.inverted_index): the corpus folds in as two incremental
    batches — batch tokenization + touched-bucket merges, never a
    corpus re-read — and the query reads the STATS partition plus ONLY
    the four query terms' posting-list buckets (PartitionFilters,
    plan-asserted in tests), reproducing bm25_scores' arithmetic
    bit-for-bit.  Sharing bm25_search_top10's from-scratch oracle proves
    index-built + index-served == recomputed — the search-tier serving
    shape next to the analytical one."""
    import shutil
    from pathlib import Path

    from pyspark.sql.window import Window

    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents)

    docs = load(spark, sf_dir)["documents"]
    # build-once fixture (BOTH folds incremental), probe per call — the
    # serving steady state, same framing as knn_ivfpq_index_top5; the
    # fold-correctness invariants are separately pinned by
    # test_inverted_index_incremental_equals_single_build and the
    # streaming twin's scratch-built end-to-end run
    index = (Path(__file__).resolve().parent.parent.parent / ".cache"
             / "inverted_index" / Path(sf_dir.rstrip("/")).name)
    marker = index / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(index, ignore_errors=True)
        index_add_documents(spark, str(index),
                            docs.filter(F.col("doc_id") % 2 == 0))
        index_add_documents(spark, str(index),
                            docs.filter(F.col("doc_id") % 2 == 1))
        marker.touch()
    scores = bm25_from_index(spark, str(index),
                             ["table", "join", "window", "hash"])
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (scores.orderBy(F.col("score").desc(), "doc_id").limit(10)
            .withColumn("rk", F.row_number().over(w)))


@query("streaming_index_ingest", oracle=r"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('table', 'join', 'window', 'hash') GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (SELECT tf.doc_id,
                  CAST(round(SUM(CAST(round(
                      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)
                         + 1.0) * tf * 2.2
                      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                      12) AS DECIMAL(28,12))), 9) AS DOUBLE) AS score
           FROM tf JOIN dfreq USING (term) JOIN doclen USING (doc_id)
                CROSS JOIN stats
           GROUP BY tf.doc_id)
SELECT doc_id, score, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored) r WHERE rk <= 10
""")
def streaming_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the inverted index, driver-gated
    end-to-end (streaming.stream_index_ingest): documents arrive as
    three micro-batches, land idempotently, and fold their postings +
    stats under applied markers (additive folds — the marker carries
    exactly-once); the streamed index then serves the same top-10 as
    the from-scratch scorer (shared oracle) — a search tier indexing the
    crawl as it lands."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql.window import Window

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.inverted_index import bm25_from_index
    from localsql_spark.streaming.stream_index_ingest import \
        stream_index_ingest

    docs = load(spark, sf_dir)["documents"]
    src_dir = (_CACHE_DIR.parent / "stream_index_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="ixsplit_")
            (docs.filter(hash32(F.col("doc_id")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="stream_ix_"))
    stream_index_ingest(
        spark, source_dir=str(src_dir), schema=schema,
        land_dir=str(scratch / "land"), index_dir=str(scratch / "index"),
        checkpoint_dir=str(scratch / "ck"))
    scores = bm25_from_index(spark, str(scratch / "index"),
                             ["table", "join", "window", "hash"])
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    out = (scores.orderBy(F.col("score").desc(), "doc_id").limit(10)
           .withColumn("rk", F.row_number().over(w))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("tpch_refresh_orders", oracle="""
WITH kept AS (
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
             AS BIGINT) % 13 <> 0
  UNION ALL
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
             AS BIGINT) % 17 = 0)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM kept
GROUP BY o_orderpriority
""")
def tpch_refresh_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H refresh-stream shape (RF1 inserts + RF2 deletes) against
    the partitioned merge store, now tombstone-aware
    (sinks.merge.merge_into_partitioned with op_col — the MERGE ... WHEN
    MATCHED DELETE half of CDC): orders load as the base, one batch
    inserts a new-key slice (RF1) AND tombstones 1/13 of existing keys
    at a higher version (RF2); a touched partition whose rows are all
    tombstoned actually loses its bytes (staged empty dir).  The
    read-back aggregate must equal base - deletes + inserts — the oracle
    computes exactly that set."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.merge import merge_into_partitioned

    orders = load(spark, sf_dir)["orders"]
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    base = orders.select(*cols, F.lit(1).cast("int").alias("version"))
    h = hash32(F.col("o_orderkey"))
    rf1 = (orders.filter(h % 17 == 0)
           .select((F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                   "o_orderpriority", "o_totalprice",
                   F.lit(1).cast("int").alias("version"),
                   F.lit("upsert").alias("op")))
    rf2 = (orders.filter(h % 13 == 0)
           .select(*cols, F.lit(2).cast("int").alias("version"),
                   F.lit("delete").alias("op")))
    scratch = Path(tempfile.mkdtemp(prefix="tpch_rf_"))
    store = str(scratch / "orders")
    base.write.partitionBy("o_orderpriority").parquet(store)
    merge_into_partitioned(spark, store, rf1.unionByName(rf2),
                           key="o_orderkey", version="version",
                           partition_col="o_orderpriority", op_col="op")
    back = spark.read.parquet(store)
    out = (back.groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double").alias("sum_price"))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


@query("streaming_change_feed", oracle="""
WITH d AS (SELECT doc_id, lang, text,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 3 AS h3
           FROM documents)
SELECT doc_id,
       CASE WHEN h3 = 0 THEN 'insert' ELSE NULL END AS op,
       1 AS new_version, CAST(NULL AS INT) AS old_version,
       md5(concat('v1 ', text)) AS new_text_md5
FROM d WHERE h3 <= 0
UNION ALL
SELECT doc_id,
       CASE WHEN h3 = 1 THEN 'insert' ELSE 'update' END,
       2, CASE WHEN h3 = 1 THEN NULL ELSE 1 END,
       md5(concat('v2 ', text))
FROM d WHERE h3 <= 1
UNION ALL
SELECT doc_id,
       CASE WHEN h3 = 2 THEN 'insert' ELSE 'update' END,
       3, CASE WHEN h3 = 2 THEN NULL ELSE 2 END,
       md5(concat('v3 ', text))
FROM d WHERE h3 <= 2
""")
def streaming_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable streaming CDC producer, driver-gated end-to-end
    (streaming.foreach_upsert.stream_upsert_with_feed): three
    overlapping document batches stream into the keyed upsert table
    while each batch's APPLIED changes persist to an idempotent
    per-batch feed directory — written against exactly the table
    generation the merge then advances, so crash/redelivery at any
    point leaves every feed batch byte-stable.  The batch overlap is
    closed-form (hash-mod tiers at rising versions), so the oracle
    states the ENTIRE expected feed: each doc inserts in its first
    batch and updates in every later one, with the right old/new
    versions."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.streaming.foreach_upsert import (
        read_feed, stream_upsert_with_feed)

    docs = load(spark, sf_dir)["documents"]
    src_dir = _feed_src_fixture(spark, docs, sf_dir)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="stream_feed_"))
    stream_upsert_with_feed(
        spark, source_dir=str(src_dir), schema=schema,
        key="doc_id", version="version",
        out_dir=str(scratch / "table"), feed_dir=str(scratch / "feed"),
        checkpoint_dir=str(scratch / "ck"))
    feed = read_feed(spark, str(scratch / "feed"))
    out = (feed.select("doc_id", "op",
                       F.col("new_version").cast("int").alias("new_version"),
                       F.col("old_version").cast("int").alias("old_version"),
                       F.md5("new_text").alias("new_text_md5"))
           .localCheckpoint(eager=True))
    shutil.rmtree(scratch, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Right-to-be-forgotten propagation (sinks/erase.py + per-store retraction)
# ---------------------------------------------------------------------------

_H13 = ("CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
        "AS BIGINT) % 13")


@query("erase_bm25_probe", oracle=rf"""
WITH norm AS (SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents WHERE {_H13} <> 0),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM doclen),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('table', 'join', 'window', 'hash') GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (SELECT tf.doc_id,
                  CAST(round(SUM(CAST(round(
                      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)
                         + 1.0) * tf * 2.2
                      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                      12) AS DECIMAL(28,12))), 9) AS DOUBLE) AS score
           FROM tf JOIN dfreq USING (term) JOIN doclen USING (doc_id)
                CROSS JOIN stats
           GROUP BY tf.doc_id)
SELECT doc_id, score, CAST(rk AS INT) AS rk FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM scored) r WHERE rk <= 10
""")
def erase_bm25_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the INVERTED INDEX
    (sinks.inverted_index.index_erase_documents): build the index over the
    full corpus, erase a deterministic 1/13 of documents (postings removed
    AND corpus counters decremented, touched term buckets pruned from the
    erased docs' own text), then probe BM25 from the erased index.  The
    oracle computes BM25 from scratch on the erased corpus — hash-equality
    proves the post-erasure index is bit-identical to never having
    ingested the subjects (erasing the primary store alone would leave
    their text reconstructible per term from the posting lists)."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql.window import Window

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.inverted_index import (bm25_from_index,
                                                     index_add_documents,
                                                     index_erase_documents)

    docs = load(spark, sf_dir)["documents"]
    erased = docs.filter(hash32(F.col("doc_id")) % 13 == 0)
    index = tempfile.mkdtemp(prefix="erase_bm25_")
    try:
        index_add_documents(spark, index, docs)
        index_erase_documents(spark, index, erased.select("doc_id"),
                              docs=erased)
        scores = bm25_from_index(spark, index,
                                 ["table", "join", "window", "hash"])
        w = Window.orderBy(F.col("score").desc(), "doc_id")
        return (scores.orderBy(F.col("score").desc(), "doc_id").limit(10)
                .withColumn("rk", F.row_number().over(w))
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(index, ignore_errors=True)


_ERASE_LSH_ORACLE = _INCR_DEDUP_ORACLE.replace(
    "WITH alls AS (SELECT doc_id, lang, text FROM documents),",
    f"WITH alls AS (SELECT doc_id, lang, text FROM documents\n"
    f"              WHERE {_INCR_HASH} = 0 OR {_H13} <> 0),")


@query("erase_lsh_store_probe", oracle=_ERASE_LSH_ORACLE)
def erase_lsh_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the NEAR-DUP state
    (operators.dedup.erase_from_signature_store): persist the corpus
    signature store + banded sidecar, erase a deterministic 1/13 of corpus
    documents (store rewritten, sidecar pruned along the erased docs' own
    band-key prefixes, meta re-fingerprinted under the maintenance lock),
    then run the production store probe with the usual 1/9 new batch.
    The oracle computes the pairs from scratch with the erased documents
    never present — equality proves the post-erasure probe serves the
    erased corpus exactly, with no rebuild (the sidecar stays 'fresh')."""
    import shutil
    import tempfile

    from localsql_spark.operators import hash32

    docs = load(spark, sf_dir)["documents"]
    is_new = hash32(F.col("doc_id")) % 9 == 0
    erased = (docs.filter(~is_new)
              .filter(hash32(F.col("doc_id")) % 13 == 0).select("doc_id"))
    store = tempfile.mkdtemp(prefix="erase_lsh_")
    shutil.rmtree(store)  # write_signature_store creates it
    try:
        D.write_signature_store(docs.filter(~is_new), store)
        D.ensure_banded_index(spark, store, f"{store}_banded")
        D.erase_from_signature_store(spark, store, erased)
        return D.minhash_lsh_pairs_from_store(
            spark, store, docs.filter(is_new),
            threshold=0.5).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(f"{store}_banded", ignore_errors=True)
        import os as _os
        try:
            _os.unlink(f"{store}_banded.lock")
        except OSError:
            pass


_ERASE_IVFPQ_ORACLE = _IVFPQ_ORACLE.replace(
    "WHERE l.query_id <> c.vec_id",
    "WHERE l.query_id <> c.vec_id\n"
    "             AND NOT (CAST('0x' || substr(md5(CAST(c.vec_id AS "
    "VARCHAR)), 1, 8) AS BIGINT) % 13 = 0 AND c.vec_id >= 10)")


@query("erase_ivfpq_probe", oracle=_ERASE_IVFPQ_ORACLE)
def erase_ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the ANN index
    (operators.similarity.ivfpq_erase_vectors): persist the IVFPQ index,
    erase a deterministic 1/13 of non-query vectors (code rows removed
    cell-pruned; PQ codes reconstruct the embedding to within quantization
    error, so they are personal data), probe the erased index.  The model
    tables keep their full-corpus training by the documented
    non-retractable-aggregate policy, and the oracle replays exactly that:
    training CTEs over the full corpus, the ADC scan with the erased
    vectors absent."""
    import shutil
    import tempfile

    from localsql_spark.operators import hash32

    emb = load(spark, sf_dir)["embeddings"]
    erased = (emb.filter((hash32(F.col("vec_id")) % 13 == 0)
                         & (F.col("vec_id") >= 10)).select("vec_id"))
    index = tempfile.mkdtemp(prefix="erase_ivfpq_")
    try:
        S.write_ivfpq_index(emb, index, n_cells=8, m=4, k_codes=16,
                            n_iter=1)
        S.ivfpq_erase_vectors(spark, index, erased)
        return S.knn_ivfpq_from_index(
            spark, index, emb.filter(F.col("vec_id") < 10), k=5,
            n_probe=4, exclude_self=True).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(index, ignore_errors=True)


_H499 = ("CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
         "AS BIGINT) % 499")


@query("erase_users_everywhere", oracle=rf"""
WITH kept AS (SELECT doc_id, lang, text FROM documents
              WHERE {_H499} <> 0),
norm AS (SELECT doc_id,
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
         FROM kept),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
posts AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT store, rows_after, erased_refs FROM (
  SELECT 'banded_index' AS store,
         (SELECT count(*) FROM kept) * {D.N_BANDS} AS rows_after,
         CAST(0 AS BIGINT) AS erased_refs
  UNION ALL
  SELECT 'inverted_index', (SELECT count(*) FROM posts), 0
  UNION ALL
  SELECT 'primary', (SELECT count(*) FROM kept), 0
  UNION ALL
  SELECT 'scd2_history',
         (SELECT count(*) + count(*) FILTER (WHERE doc_id % 3 = 0)
          FROM kept), 0
  UNION ALL
  SELECT 'signature_store', (SELECT count(*) FROM kept), 0) u
ORDER BY store
""")
def erase_users_everywhere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED right-to-be-forgotten flow (sinks.erase.
    erase_everywhere): stand up the full persistence surface — primary
    hash-bucketed store, inverted index, signature store + banded
    sidecar, SCD2 history (init + one re-segmentation batch) — erase a
    deterministic 1/13 of subjects everywhere, and return the per-store
    audit.  ``erased_refs`` is recounted from the post-erase bytes of
    each store (a row still referencing an erased key would make it
    non-zero), and ``rows_after`` is checked against the oracle's
    from-scratch expectation on the erased corpus — store-by-store proof
    that no derived state retains the subjects.

    Request shape: the deletion request is a deterministic ~1/499 of
    subjects — the realistic per-subject GDPR cadence, and the shape the
    whole design prices for: every store's erase cost tracks the REQUEST
    (touched buckets/prefixes/cells), not the corpus.  The 1/13-sized
    mass-erase coverage lives in the three erase_*_probe queries.  The
    stores themselves are a content-stable FIXTURE built once per sf;
    each call works on a HARDLINK farm of it (erasure mutates the store,
    but every store mutation in this engine is staged-write + rename —
    new inodes — so the fixture's bytes can never be written through a
    link, and the per-call 'copy' is metadata-only).  The timed wall is
    therefore the compliance loop itself — request-sized erase + audit —
    not driver-side file duplication (round-9 verdict: the byte-copy
    dominated the headline).  The IVFPQ path is exercised by
    erase_ivfpq_probe (its training composition priced separately)."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import (erase_everywhere,
                                            write_bucketed_store)
    from localsql_spark.sinks.inverted_index import index_add_documents
    from localsql_spark.sinks.scd2_store import apply_batch, init_store

    docs = load(spark, sf_dir)["documents"]
    keys = docs.filter(hash32(F.col("doc_id")) % 499 == 0).select("doc_id")

    fixture = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "erase_all_stores" / Path(sf_dir.rstrip("/")).name)
    marker = fixture / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(fixture, ignore_errors=True)
        fixture.mkdir(parents=True, exist_ok=True)
        write_bucketed_store(docs.select("doc_id", "lang", "text"),
                             str(fixture / "primary"), "doc_id",
                             n_buckets=16)
        index_add_documents(spark, str(fixture / "inv"), docs,
                            n_buckets=16)
        D.write_signature_store(docs, str(fixture / "sigs"))
        D.ensure_banded_index(spark, str(fixture / "sigs"),
                              str(fixture / "sigs_banded"))
        init_store(docs.select("doc_id", "lang"), str(fixture / "scd2"),
                   ["doc_id"], ["lang"], 1_000_000)
        apply_batch(spark, str(fixture / "scd2"),
                    docs.filter(F.col("doc_id") % 3 == 0)
                    .select("doc_id", F.lit("MIGRATED").alias("lang")),
                    ["doc_id"], ["lang"], 2_000_000, batch_id=1)
        marker.touch()

    # scratch lives NEXT TO the fixture (same filesystem) so the per-call
    # farm is hardlinks: new directory entries, zero data bytes copied
    scratch = Path(tempfile.mkdtemp(prefix="erase_all_",
                                    dir=str(fixture.parent)))
    try:
        # hardlink farm: driver-side metadata ops with no shared state —
        # link the five stores concurrently instead of walking them
        # one after another (guide §2.6 discipline applied to file ops)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(
                lambda store: shutil.copytree(fixture / store,
                                              scratch / store,
                                              copy_function=os.link),
                ("primary", "inv", "sigs", "sigs_banded", "scd2")))
        audit = erase_everywhere(
            spark, keys,
            primary={"base_dir": str(scratch / "primary"),
                     "key_col": "doc_id", "n_buckets": 16},
            inverted_index={"index_dir": str(scratch / "inv"),
                            "n_buckets": 16},
            signature_store={"store_path": str(scratch / "sigs"),
                             "index_path": str(scratch / "sigs_banded")},
            scd2={"store_dir": str(scratch / "scd2"),
                  "key_col": "doc_id"})
        return (audit.orderBy("store")
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_IVM_DIM_ORACLE = """
SELECT CASE WHEN c.c_custkey % 50 = 0 THEN (c.c_nationkey + 1) % 25
            ELSE c.c_nationkey END AS grp,
       count(*) AS n_rows,
       round(CAST(sum(CAST(round(o.o_totalprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE), 6) AS sum_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@query("streaming_ivm_dim", oracle=_IVM_DIM_ORACLE)
def streaming_ivm_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIM-SIDE streaming maintenance of the join-aggregate view
    (streaming.stream_ivm_dim): after folding the full fact table, the
    %50 customers' nation moves arrive as an SCD-shaped dim-change
    STREAM in three micro-batches; each lands idempotently, then folds
    the Gupta-Mumick retract+re-add delta through the view (old rows
    from the maintained current-dim snapshot, cost tracking the changed
    keys' fact rows), completing the maintenance pair with
    streaming_ivm_ingest's fact side.  Shares ivm_dim_rebase's
    from-scratch oracle: streamed dim maintenance == full recompute
    against the post-change dimension."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view
    from localsql_spark.streaming.stream_ivm_dim import (init_dim_snapshot,
                                                         stream_ivm_dim_ingest)

    t = load(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    changed = (customer.filter(F.pmod(F.col("c_custkey"), F.lit(50)) == 0)
               .select("c_custkey",
                       F.pmod(F.col("c_nationkey") + 1, F.lit(25))
                       .alias("c_nationkey")))
    src_dir = (_CACHE_DIR.parent / "stream_ivm_dim_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="dsplit_")
            (changed.filter(hash32(F.col("c_custkey")) % 3 == i).coalesce(1)
             .write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="stream_ivm_dim_"))
    try:
        maintain_join_view(spark, str(scratch / "view"), orders, customer,
                           fact_key="o_custkey", dim_key="c_custkey",
                           group_col="c_nationkey",
                           value_col="o_totalprice")
        init_dim_snapshot(customer.select("c_custkey", "c_nationkey"),
                          str(scratch / "dim"))
        stream_ivm_dim_ingest(
            spark, source_dir=str(src_dir), schema=schema,
            land_dir=str(scratch / "land"), view_dir=str(scratch / "view"),
            dim_dir=str(scratch / "dim"),
            checkpoint_dir=str(scratch / "ck"), fact=orders,
            dim_key="c_custkey", group_col="c_nationkey",
            fact_key="o_custkey", value_col="o_totalprice")
        v = read_join_view(spark, str(scratch / "view"))
        return (v.select("grp", "n_rows",
                         F.round(F.col("sum_value").cast("double"), 6)
                         .alias("sum_value"))
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("streaming_erase_requests", oracle="""
SELECT lang, count(*) AS n_docs, CAST(0 AS BIGINT) AS erased_left
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 31 <> 0
GROUP BY lang
ORDER BY lang
""")
def streaming_erase_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming right-to-be-forgotten QUEUE
    (streaming.stream_erase_ingest — the tenth streaming twin): a
    deterministic 1/31 of subjects arrives as deletion requests in three
    micro-batches; each lands idempotently, then folds through
    erase_keys into the key-bucketed primary store under the shared
    marker-committed loop (per-batch cost = the request's touched
    buckets; erasure is idempotent, so even the loop's one crash window
    is a harmless re-erase).  Returns the post-erase store per lang plus
    ``erased_left`` recounted from the store's actual bytes — the oracle
    states the erased corpus from scratch and literal zero, so streamed
    queue == one-shot erase == never-ingested."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import (read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.streaming.stream_erase_ingest import \
        stream_erase_ingest

    docs = load(spark, sf_dir)["documents"]
    erased = hash32(F.col("doc_id")) % 31 == 0

    src_dir = (_CACHE_DIR.parent / "stream_erase_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="esplit_")
            (docs.filter(erased).select("doc_id")
             .filter(hash32(F.concat(F.lit("eb:"),
                                     F.col("doc_id").cast("string")))
                     % 3 == i)
             .coalesce(1).write.mode("overwrite").parquet(tmp))
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    scratch = Path(tempfile.mkdtemp(prefix="stream_erase_"))
    try:
        store = str(scratch / "store")
        write_bucketed_store(docs.select("doc_id", "lang", "text"), store,
                             "doc_id", n_buckets=16)
        stream_erase_ingest(
            spark, source_dir=str(src_dir), schema="doc_id long",
            land_dir=str(scratch / "land"), store_dir=store,
            checkpoint_dir=str(scratch / "ck"), key_col="doc_id",
            n_buckets=16)
        post = read_bucketed_store(spark, store)
        out = (post.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.count(F.when(erased, 1)).alias("erased_left"))
               .orderBy("lang"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# Rebuild of non-retractable aggregates after erasure
# ---------------------------------------------------------------------------

_VH13 = ("CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) "
         "AS BIGINT) % 13")

# each sub-oracle is the full-corpus oracle of the corresponding live
# query, retargeted at the POST-ERASE corpus — "rebuilt == from-scratch
# on the kept rows" is exactly the claim the operator makes
_REBUILD_NB = _NB_ORACLE.replace(
    "FROM documents)", f"FROM documents WHERE {_H13} <> 0)")
_REBUILD_PQ = (_IVFPQ_ORACLE
               .replace("FROM embeddings)",
                        f"FROM embeddings\n"
                        f"            WHERE NOT ({_VH13} = 0 "
                        f"AND vec_id >= 10))")
               .replace(
    "seeds AS (SELECT s, vec_id - 8 AS code, sp, x AS y FROM sv\n"
    "          WHERE vec_id >= 8 AND vec_id < 24),",
    "sids AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1\n"
    "                  AS code\n"
    "         FROM (SELECT DISTINCT vec_id FROM sv WHERE vec_id >= 8\n"
    "               ORDER BY vec_id LIMIT 16) q),\n"
    "seeds AS (SELECT sv.s, sids.code, sv.sp, sv.x AS y\n"
    "          FROM sv JOIN sids USING (vec_id)),"))


def _rebuild_oracle() -> str:
    from localsql_spark.workload.corpus_suite import _hll_diversity_oracle

    hll = _hll_diversity_oracle().replace(
        "FROM documents", f"FROM documents WHERE {_H13} <> 0")
    return f"""
SELECT component, k, metric FROM (
  SELECT 'nb' AS component, CAST(doc_id AS VARCHAR) AS k,
         nb_score AS metric FROM ({_REBUILD_NB}) nbq
  UNION ALL
  SELECT 'hll', concat(COALESCE(source, '<null>'), '#distinct'),
         approx_distinct FROM ({hll}) h1
  UNION ALL
  SELECT 'hll', concat(COALESCE(source, '<null>'), '#ngrams'),
         CAST(total_ngrams AS DOUBLE) FROM ({hll}) h2
  UNION ALL
  SELECT 'ivfpq',
         CAST(query_id AS VARCHAR) || ':' || CAST(rn AS VARCHAR),
         CAST(neighbor_id AS DOUBLE) FROM ({_REBUILD_PQ}) pqq) u
"""


@query("erase_rebuild_models", oracle=_rebuild_oracle())
def erase_rebuild_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REBUILD half of right-to-be-forgotten (sinks.erase.
    rebuild_nonretractable): NB token counts, HLL registers, and trained
    IVFPQ model tables cannot retract a subject row-by-row, so erasure
    for that state class is a RETRAIN from the post-erase corpus.  This
    query stands up all three on the FULL corpus, erases a deterministic
    1/13 of subjects (docs everywhere; vectors >= 10 so the coarse seeds
    stay probeable), erases the retractable IVFPQ code rows, then runs
    the rebuild operator and probes every rebuilt store:

    - NB: every kept document re-scored against the rebuilt count model;
    - HLL: per-source diversity estimates from the rebuilt registers;
    - IVFPQ: top-5 ADC neighbors from the rebuilt index (fresh
      centroids, codebooks AND codes — trained WITHOUT the erased
      vectors, unlike erase_ivfpq_probe's stale-model policy half).

    The oracle recomputes each observable from scratch on the kept rows
    only — equality proves the rebuilt state is bit-identical to one
    that never saw the erased subjects, the same discipline as the three
    erase probes.  One long-format frame (component, k, metric) carries
    all three."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.operators.selection import (nb_model_read,
                                                    nb_model_update,
                                                    nb_score_with_model)
    from localsql_spark.sinks.erase import rebuild_nonretractable
    from localsql_spark.sinks.sketch_view import (sketch_view_read,
                                                  sketch_view_update)

    t = load(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    kept_docs = (docs.filter(hash32(F.col("doc_id")) % 13 != 0)
                 .localCheckpoint(eager=False))
    erased_vecs = (emb.filter((hash32(F.col("vec_id")) % 13 == 0)
                              & (F.col("vec_id") >= 10))
                   .select("vec_id"))
    kept_emb = (emb.join(F.broadcast(erased_vecs), "vec_id", "left_anti")
                .localCheckpoint(eager=False))
    is_pos = F.substring("source", 4, 10).cast("int") < 5

    scratch = Path(tempfile.mkdtemp(prefix="erase_rebuild_"))
    model_dir = str(scratch / "nb_model")
    view_dir = str(scratch / "sketch_view")
    index = str(scratch / "ivfpq")
    try:
        # full-corpus builds: the state to be forgotten
        nb_model_update(spark, model_dir, docs, is_pos)
        sketch_view_update(spark, view_dir, docs)
        S.write_ivfpq_index(emb, index, n_cells=8, m=4, k_codes=16,
                            n_iter=1)
        # retractable half first (code rows), then retrain the rest
        S.ivfpq_erase_vectors(spark, index, erased_vecs)
        rebuild_nonretractable(
            spark,
            nb_model={"model_dir": model_dir, "docs": kept_docs,
                      "positive": is_pos},
            sketch_view={"view_dir": view_dir, "docs": kept_docs},
            ivfpq_index={"index_path": index, "corpus": kept_emb,
                         "n_cells": 8, "m": 4, "k_codes": 16,
                         "n_iter": 1})

        model, dc = nb_model_read(spark, model_dir)
        nb = (nb_score_with_model(kept_docs, model, dc, is_pos)
              .select(F.lit("nb").alias("component"),
                      F.col("doc_id").cast("string").alias("k"),
                      F.col("nb_score").alias("metric")))
        hll = sketch_view_read(spark, view_dir)
        grp = F.coalesce(F.col("source"), F.lit("<null>"))
        h1 = hll.select(F.lit("hll").alias("component"),
                        F.concat(grp, F.lit("#distinct")).alias("k"),
                        F.col("approx_distinct").alias("metric"))
        h2 = hll.select(F.lit("hll").alias("component"),
                        F.concat(grp, F.lit("#ngrams")).alias("k"),
                        F.col("total_ngrams").cast("double")
                        .alias("metric"))
        pq = S.knn_ivfpq_from_index(spark, index,
                                    emb.filter(F.col("vec_id") < 10),
                                    k=5, n_probe=4, exclude_self=True)
        p1 = pq.select(F.lit("ivfpq").alias("component"),
                       F.concat(F.col("query_id").cast("string"),
                                F.lit(":"),
                                F.col("rn").cast("string")).alias("k"),
                       F.col("neighbor_id").cast("double")
                       .alias("metric"))
        return (nb.unionByName(h1).unionByName(h2).unionByName(p1)
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("maintenance_compact_store", oracle="""
SELECT lang, count(*) AS n_docs,
       round(CAST(sum(CAST(round(n_chars, 6) AS DECIMAL(28,6)))
                  AS DOUBLE), 6) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
""")
def maintenance_compact_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files maintenance (sinks.merge.compact_partitions): lay the
    corpus out the way a pre-round-10 fold loop did (partitionBy straight
    off a parallel shuffle — one sliver file per task per partition),
    compact every over-limit partition down to one file through the
    manifest commit, and return per-partition counts + an exact content
    checksum read from the POST-compaction bytes.  The oracle recomputes
    both from the raw table — equality proves compaction is purely a
    layout rewrite (no row lost, duplicated, or altered), the same
    discipline as the erase probes.  Asserts the layout goal directly:
    any partition still holding more than one part file raises."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.sinks.merge import compact_partitions

    docs = load(spark, sf_dir)["documents"]
    scratch = Path(tempfile.mkdtemp(prefix="compact_store_"))
    base = str(scratch / "store")
    try:
        (docs.select("doc_id", "lang", "n_chars").repartition(16)
         .write.mode("overwrite").partitionBy("lang").parquet(base))
        compact_partitions(spark, base, "lang")
        fat = [d.name for d in Path(base).glob("lang=*")
               if len(list(d.glob("*.parquet"))) > 1]
        if fat:
            raise AssertionError(f"partitions still sliver-filed: {fat}")
        out = (spark.read.option("basePath", base).parquet(base)
               .groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.round(F.sum(F.round(F.col("n_chars"), 6)
                                  .cast("decimal(28,6)")).cast("double"), 6)
                    .alias("sum_chars"))
               .orderBy("lang"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_ERASE_IVF_ORACLE = _IVF_ORACLE.replace(
    "cassign AS (SELECT vec_id AS neighbor_id, cell FROM ranked "
    "WHERE crn = 1),",
    f"cassign AS (SELECT vec_id AS neighbor_id, cell FROM ranked\n"
    f"            WHERE crn = 1\n"
    f"              AND NOT ({_VH13} = 0 AND vec_id >= 16)),")


@query("erase_ivf_index_probe", oracle=_ERASE_IVF_ORACLE)
def erase_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the FULL-VECTOR ANN index
    (operators.similarity.ivf_erase_vectors): build the persisted IVF
    index on part of the corpus, append the rest as a delta batch
    (assignment against the same centroid table — union == one build),
    erase a deterministic 1/13 of non-seed vectors (the erase compacts
    the delta first, then rewrites only the touched cell partitions —
    unlike IVFPQ this index stores the subjects' raw embeddings, so the
    bytes must go), and probe.  The oracle computes the IVF probe with
    the erased vectors absent from the assignment — post-erase serving
    == an index that never held the subjects.  Seeds (vec_id < 16) stay
    un-erased here so the deterministic centroid table matches the
    oracle's; erasing a SEED additionally requires the centroid retrain
    (sinks.erase.rebuild_nonretractable, ivf_index config)."""
    import shutil
    import tempfile

    from localsql_spark.operators import hash32

    emb = load(spark, sf_dir)["embeddings"]
    is_delta = (F.col("vec_id") >= 16) & (F.col("vec_id") % 5 == 3)
    erased = (emb.filter((hash32(F.col("vec_id")) % 13 == 0)
                         & (F.col("vec_id") >= 16)).select("vec_id"))
    index = tempfile.mkdtemp(prefix="erase_ivf_")
    try:
        S.write_ivf_index(emb.filter(~is_delta), index, n_cells=16)
        S.append_ivf_index(spark, index, emb.filter(is_delta), batch_id=1)
        S.ivf_erase_vectors(spark, index, erased)
        return S.knn_ivf_from_index(
            spark, index, emb.filter(F.col("vec_id") < 10), k=5,
            n_probe=4).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(index, ignore_errors=True)


@query("knn_ivfpq_2l_top5", oracle=_IVFPQ_ORACLE)
def knn_ivfpq_2l_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with the TWO-LEVEL coarse assignment
    (operators.similarity.coarse_assign_two_level — the O(N*sqrt(k))
    build path for corpus-proportional cell counts; SCALE.md round 10:
    6.3x faster than flat at 64x) pinned under the driver gate through
    its exactness identity: probing every super-cell (assign_probe =
    n_coarse = 2 at n_cells = 8) makes the candidate set all k cells, so
    the assignment — and therefore the whole IVFADC answer — equals the
    flat path row-for-row and SHARES knn_ivfpq_top5's exact oracle.  Any
    drift in the routing (super-quantizer build, disjoint-partition
    multi-probe, argmin tie-break) shows up as a hash mismatch."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_ivfpq_adc(emb, emb.filter(F.col("vec_id") < 10), k=5,
                           n_cells=8, n_probe=4, m=4, k_codes=16,
                           n_iter=1, exclude_self=True,
                           two_level_assign=True, assign_probe=2)


# ---------------------------------------------------------------------------
# Right-to-be-forgotten: aggregate stores + durable CDC feed (round 11)
# ---------------------------------------------------------------------------

_UH13 = ("CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) "
         "AS BIGINT) % 13")
_CH13 = ("CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) "
         "AS BIGINT) % 13")


@query("erase_rollup_probe", oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 6)
         AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
WHERE {_UH13} <> 0
GROUP BY 1, 2
""")
def erase_rollup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the AGGREGATE rollup store
    (sinks.rollup.erase_from_rollup, wired via erase_everywhere): the
    persisted hourly rollup carries no user column, but erased users'
    events still live inside its counts/sums/extremes — this probe
    erases a deterministic 1/13 of users from the full-corpus rollup
    fixture (hardlink farm per call, same discipline as
    erase_users_everywhere) and reads the post-erase store back.  The
    invertible aggregates (count, decimal sum) retract as a
    Gupta-Mumick negative delta; min/max heal by a recompute pruned to
    the groups whose extreme the subjects attained.  The oracle states
    the rollup from scratch on the kept events — post-erase bytes == a
    store that never folded the subjects, bit-for-bit — and
    erase_everywhere's divergence audit re-checks the same claim inside
    the flow (any non-zero raises here)."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import erase_everywhere
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup

    ev = load(spark, sf_dir)["events"]
    keys = (ev.filter(hash32(F.col("user_id")) % 13 == 0)
            .select("user_id").distinct())
    fixture = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "erase_rollup" / Path(sf_dir.rstrip("/")).name)
    marker = fixture / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(fixture, ignore_errors=True)
        fixture.mkdir(parents=True, exist_ok=True)
        maintain_rollup(spark, str(fixture / "roll"), ev, grain="hour")
        marker.touch()
    scratch = Path(tempfile.mkdtemp(prefix="erase_roll_",
                                    dir=str(fixture.parent)))
    try:
        shutil.copytree(fixture / "roll", scratch / "roll",
                        copy_function=os.link)
        audit = erase_everywhere(
            spark, keys,
            rollup={"rollup_dir": str(scratch / "roll"), "events": ev,
                    "subject_col": "user_id", "grain": "hour"})
        bad = [r for r in audit.collect() if r["erased_refs"] != 0]
        if bad:
            raise AssertionError(f"post-erase rollup diverges: {bad}")
        r = read_rollup(spark, str(scratch / "roll"))
        return (r.select(
            "bucket_ts", F.col("key").alias("event_type"), "n_events",
            F.round(F.col("sum_value").cast("double"), 6)
            .alias("sum_value"), "min_value", "max_value")
            .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("erase_ivm_probe", oracle=f"""
SELECT c.c_nationkey AS grp,
       count(*) AS n_rows,
       round(CAST(sum(CAST(round(o.o_totalprice, 6) AS DECIMAL(28,6)))
                  AS DOUBLE), 6) AS sum_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE {_CH13} <> 0
GROUP BY 1
""")
def erase_ivm_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the incrementally-maintained
    JOIN-aggregate view (sinks.ivm.erase_from_view, wired via
    erase_everywhere): erase a deterministic 1/13 of customers from the
    revenue-by-nation view — their orders' contribution retracts as the
    pure Gupta-Mumick negative delta (-(fact_subjects ⋈ dim), the
    retract half of apply_dim_change), rewriting only the touched
    grp_bucket partitions.  Count and decimal sum are both invertible,
    so no heal pass is needed; the oracle recomputes the view from the
    kept fact rows — post-erase bytes == a view that never folded the
    subjects — and erase_everywhere's divergence audit re-checks the
    same claim inside the flow."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import erase_everywhere
    from localsql_spark.sinks.ivm import maintain_join_view, read_join_view

    t = load(spark, sf_dir)
    orders, customer = t["orders"], t["customer"]
    keys = (customer.filter(hash32(F.col("c_custkey")) % 13 == 0)
            .select("c_custkey"))
    fixture = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "erase_ivm" / Path(sf_dir.rstrip("/")).name)
    marker = fixture / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(fixture, ignore_errors=True)
        fixture.mkdir(parents=True, exist_ok=True)
        maintain_join_view(spark, str(fixture / "view"), orders, customer,
                           fact_key="o_custkey", dim_key="c_custkey",
                           group_col="c_nationkey",
                           value_col="o_totalprice")
        marker.touch()
    scratch = Path(tempfile.mkdtemp(prefix="erase_ivm_",
                                    dir=str(fixture.parent)))
    try:
        shutil.copytree(fixture / "view", scratch / "view",
                        copy_function=os.link)
        # the bucket-count meta + schema sidecars live NEXT TO the view
        # dir, outside the copytree — carry them into the farm
        for sidecar in (".view.meta.json", ".view.schema.json"):
            if (fixture / sidecar).exists():
                shutil.copy(fixture / sidecar, scratch / sidecar)
        audit = erase_everywhere(
            spark, keys,
            ivm_view={"view_dir": str(scratch / "view"), "fact": orders,
                      "subject_col": "o_custkey", "dim": customer,
                      "fact_key": "o_custkey", "dim_key": "c_custkey",
                      "group_col": "c_nationkey",
                      "value_col": "o_totalprice"})
        bad = [r for r in audit.collect() if r["erased_refs"] != 0]
        if bad:
            raise AssertionError(f"post-erase IVM view diverges: {bad}")
        v = read_join_view(spark, str(scratch / "view"))
        return (v.select(
            "grp", "n_rows",
            F.round(F.col("sum_value").cast("double"), 6)
            .alias("sum_value"))
            .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("erase_feed_probe", oracle="""
WITH d AS (SELECT doc_id, lang, text,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 3 AS h3,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 13 AS h13
           FROM documents)
SELECT doc_id,
       CASE WHEN h3 = 0 THEN 'insert' ELSE NULL END AS op,
       1 AS new_version, CAST(NULL AS INT) AS old_version,
       md5(concat('v1 ', text)) AS new_text_md5
FROM d WHERE h3 <= 0 AND h13 <> 0
UNION ALL
SELECT doc_id,
       CASE WHEN h3 = 1 THEN 'insert' ELSE 'update' END,
       2, CASE WHEN h3 = 1 THEN NULL ELSE 1 END,
       md5(concat('v2 ', text))
FROM d WHERE h3 <= 1 AND h13 <> 0
UNION ALL
SELECT doc_id,
       CASE WHEN h3 = 2 THEN 'insert' ELSE 'update' END,
       3, CASE WHEN h3 = 2 THEN NULL ELSE 2 END,
       md5(concat('v3 ', text))
FROM d WHERE h3 <= 2 AND h13 <> 0
""")
def erase_feed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten through the DURABLE change feed
    (streaming.foreach_upsert.erase_from_feed, wired via
    erase_everywhere): the CDC record persists every subject's pre- and
    new-images forever, and prune_feed is retention-gated, not
    subject-addressable — so erasure must rewrite the feed itself.
    This probe produces streaming_change_feed's three-batch durable
    feed (same cached source fixture), erases a deterministic 1/13 of
    documents from it, and replays the post-erase feed.  Only batches
    containing subjects rewrite (staged + manifest-committed, healable
    from any crash point; untouched dirs byte-stable — pinned in
    tests/test_erase_propagate.py); batch ids, _SUCCESS markers and
    consumer offsets survive.  The oracle states the ENTIRE feed a
    store that never saw the subjects would have produced — per-key
    change emission is what makes erased-feed == never-saw-feed exact."""
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import erase_everywhere
    from localsql_spark.streaming.foreach_upsert import (
        read_feed, stream_upsert_with_feed)

    docs = load(spark, sf_dir)["documents"]
    keys = (docs.filter(hash32(F.col("doc_id")) % 13 == 0)
            .select("doc_id"))
    src_dir = _feed_src_fixture(spark, docs, sf_dir)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="erase_feed_"))
    try:
        stream_upsert_with_feed(
            spark, source_dir=str(src_dir), schema=schema,
            key="doc_id", version="version",
            out_dir=str(scratch / "table"), feed_dir=str(scratch / "feed"),
            checkpoint_dir=str(scratch / "ck"))
        audit = erase_everywhere(
            spark, keys,
            feed={"feed_dir": str(scratch / "feed"),
                  "key_col": "doc_id"})
        bad = [r for r in audit.collect() if r["erased_refs"] != 0]
        if bad:
            raise AssertionError(f"post-erase feed retains subjects: {bad}")
        feed = read_feed(spark, str(scratch / "feed"))
        return (feed.select(
            "doc_id", "op",
            F.col("new_version").cast("int").alias("new_version"),
            F.col("old_version").cast("int").alias("old_version"),
            F.md5("new_text").alias("new_text_md5"))
            .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("dp_release_lang_source", oracle="""
WITH counted AS (
  SELECT lang, source, count(*) AS true_n
  FROM documents GROUP BY lang, source HAVING count(*) >= 5),
noised AS (
  SELECT lang, source, true_n,
         ((CAST(CAST('0x' || substr(md5(
             concat_ws(chr(31), 'dp-release', 'counts|eps=1',
                       COALESCE(CAST(lang AS VARCHAR), '<null>'),
                       COALESCE(CAST(source AS VARCHAR), '<null>'))),
             1, 8) AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
         - 0.5 AS u
  FROM counted)
SELECT lang, source,
       round(true_n + (-1.0) * sign(u) * ln(1 - 2 * abs(u)), 6) AS noisy_n
FROM noised
""")
def dp_release_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance release with the Laplace mechanism
    (sinks.erase.dp_noisy_counts, Dwork et al. TCC 2006): per
    (lang, source) document counts released with k-anonymity
    suppression (classes under 5 dropped) and seeded Laplace(1/eps)
    noise at eps=1 — the output-perturbation step that bounds what the
    released aggregate reveals about any one subject, completing the
    governance trio next to pseudonymize and k_anonymity_audit.  The
    oracle replays the hash-seeded inverse-CDF draw exactly (portable
    md5-derived uniform, sign/ln arithmetic), so the DRAW ITSELF is
    hash-verified cross-engine, not just the counts.  One map-side-
    combined groupBy + row-local noise; output is class-count-sized at
    any corpus scale."""
    from localsql_spark.sinks.erase import dp_noisy_counts

    docs = load(spark, sf_dir)["documents"]
    return dp_noisy_counts(docs, ["lang", "source"], epsilon=1.0,
                           min_class=5, seed="dp-release")


def _feed_src_fixture(spark: SparkSession, docs: DataFrame,
                      sf_dir: str) -> Path:
    """The shared three-batch change-feed SOURCE fixture (same layout and
    cache key as streaming_change_feed / erase_feed_probe build inline):
    batch i holds every h3<=i document at version i+1 with 'v{i+1} '
    prefixed text.  Built once per sf_dir under the catalog cache."""
    import os
    import shutil
    import tempfile

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32

    h3 = hash32(F.col("doc_id")) % 3
    src_dir = (_CACHE_DIR.parent / "stream_feed_src"
               / Path(sf_dir.rstrip("/")).name)
    if src_dir.exists():
        return src_dir
    src_dir.parent.mkdir(parents=True, exist_ok=True)
    build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                  dir=src_dir.parent))
    names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
    for i, name in enumerate(names):
        b = (docs.filter(h3 <= i)
             .select("doc_id", "lang",
                     F.concat(F.lit(f"v{i + 1} "), F.col("text"))
                     .alias("text"),
                     F.lit(i + 1).cast("int").alias("version")))
        tmp = tempfile.mkdtemp(prefix="cfsplit_")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(Path(tmp).glob("part-*.parquet"))
        shutil.move(str(part), build / name)
        shutil.rmtree(tmp, ignore_errors=True)
    t0 = (build / names[0]).stat().st_mtime
    for i, name in enumerate(names):
        os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
    try:
        os.rename(build, src_dir)
    except OSError:
        shutil.rmtree(build, ignore_errors=True)
    return src_dir


@query("subject_access_probe", oracle="""
WITH d AS (SELECT doc_id, lang, source, text,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS h
           FROM documents),
s AS (SELECT *, h % 3 AS h3 FROM d WHERE h % 17 = 0)
SELECT 'primary' AS store, CAST(doc_id AS VARCHAR) AS subject_key,
       md5(concat_ws(chr(31), CAST(doc_id AS VARCHAR), lang, source,
                     md5(text))) AS record_md5
FROM s
UNION ALL
SELECT 'scd2', CAST(doc_id AS VARCHAR),
       md5(concat_ws(chr(31), CAST(doc_id AS VARCHAR), lang,
                     '1000000', '<null>'))
FROM s WHERE h % 5 <> 0
UNION ALL
SELECT 'scd2', CAST(doc_id AS VARCHAR),
       md5(concat_ws(chr(31), CAST(doc_id AS VARCHAR), lang,
                     '1000000', '2000000'))
FROM s WHERE h % 5 = 0
UNION ALL
SELECT 'scd2', CAST(doc_id AS VARCHAR),
       md5(concat_ws(chr(31), CAST(doc_id AS VARCHAR), 'xx',
                     '2000000', '<null>'))
FROM s WHERE h % 5 = 0
UNION ALL
SELECT 'feed', CAST(doc_id AS VARCHAR),
       md5(concat_ws(chr(31), CAST(b AS VARCHAR), CAST(doc_id AS VARCHAR),
                     md5(concat('v', CAST(b + 1 AS VARCHAR), ' ', text)),
                     CAST(b + 1 AS VARCHAR),
                     CASE WHEN b = h3 THEN '<null>'
                          ELSE md5(concat('v', CAST(b AS VARCHAR), ' ',
                                          text)) END,
                     CASE WHEN b = h3 THEN '<null>'
                          ELSE CAST(b AS VARCHAR) END,
                     CASE WHEN b = h3 THEN 'insert' ELSE 'update' END))
FROM s, UNNEST(range(0, 3)) t(b) WHERE h3 <= b
UNION ALL
SELECT 'ledger', CAST(doc_id AS VARCHAR),
       md5(concat_ws(chr(31), CAST(doc_id AS VARCHAR)))
FROM s WHERE h % 13 = 0
""")
def subject_access_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject ACCESS request across the persistence surface
    (sinks.erase.export_subject + access_manifest — GDPR Art. 15/20,
    the read half of the erase_everywhere pair): builds a bucketed
    primary store, a two-batch SCD2 history, the shared three-batch
    durable change feed, and an erase ledger holding a prior request,
    then exports one deterministic subject cohort (hash %17) from all
    four and folds the responses into the (store, subject_key,
    record_md5) manifest.  Every read is pruned the way the matching
    erase is pruned — subject buckets, touched feed batches — so an
    access request costs what it touches at any corpus scale.  The
    oracle restates every record each store must disclose (primary row,
    both history versions, every feed image incl. pre-images, the prior
    deletion request), so the response is proven COMPLETE and exact,
    not just non-empty."""
    import shutil
    import tempfile

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import (access_manifest,
                                            erase_ledger_append,
                                            export_subject,
                                            write_bucketed_store)
    from localsql_spark.sinks.scd2_store import apply_batch, init_store
    from localsql_spark.streaming.foreach_upsert import stream_upsert_with_feed

    docs = load(spark, sf_dir)["documents"]
    h = hash32(F.col("doc_id"))
    subjects = docs.filter(h % 17 == 0).select("doc_id")

    src_dir = _feed_src_fixture(spark, docs, sf_dir)
    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="access_"))
    try:
        primary_dir = str(scratch / "primary")
        write_bucketed_store(
            docs.select("doc_id", "lang", "source", "text"),
            primary_dir, "doc_id", n_buckets=32)

        scd2_dir = str(scratch / "scd2")
        init_store(docs.select("doc_id", "lang"), scd2_dir,
                   ["doc_id"], ["lang"], 1_000_000)
        upd = (docs.filter(h % 5 == 0)
               .select("doc_id", F.lit("xx").alias("lang")))
        apply_batch(spark, scd2_dir, upd, ["doc_id"], ["lang"],
                    2_000_000, batch_id=1)

        stream_upsert_with_feed(
            spark, source_dir=str(src_dir), schema=schema,
            key="doc_id", version="version",
            out_dir=str(scratch / "table"),
            feed_dir=str(scratch / "feed"),
            checkpoint_dir=str(scratch / "ck"))

        ledger_dir = str(scratch / "ledger")
        erase_ledger_append(docs.filter(h % 13 == 0).select("doc_id"),
                            ledger_dir, batch_id=0)

        exp = export_subject(
            spark, subjects,
            primary={"base_dir": primary_dir, "key_col": "doc_id",
                     "n_buckets": 32},
            scd2={"store_dir": scd2_dir, "key_col": "doc_id"},
            feed={"feed_dir": str(scratch / "feed"), "key_col": "doc_id"},
            ledger={"ledger_dir": ledger_dir})
        # pre-shape for a cross-engine digest: blobs to md5, versions to
        # int-strings; column-name-sorted order is what the oracle states
        shaped = {
            "primary": exp["primary"].select(
                "doc_id", "lang", "source", F.md5("text").alias("text_md5")),
            "scd2": exp["scd2"].select(
                "doc_id", "lang", "valid_from_us", "valid_to_us"),
            "feed": exp["feed"].select(
                "batch_id", "doc_id", "op",
                F.col("new_version").cast("int").alias("new_version"),
                F.col("old_version").cast("int").alias("old_version"),
                F.md5("new_text").alias("new_text_md5"),
                F.md5("old_text").alias("old_text_md5")),
            "ledger": exp["ledger"].select(
                F.col("erased_key").cast("string").alias("erased_key")),
        }
        man = access_manifest(shaped, key_cols={
            "primary": "doc_id", "scd2": "doc_id", "feed": "doc_id",
            "ledger": "erased_key"})
        return man.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("retention_expiry_probe", oracle="""
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS m FROM events)
SELECT event_id,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date, event_type
FROM events, mx
WHERE CAST(ts AS DATE) >= m - 7
""")
def retention_expiry_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-grained retention enforcement
    (sinks.merge.expire_partitions — the storage-limitation principle):
    lands events into a date-partitioned store, expires every partition
    older than max_date - 7 days, and reads the store back.  The expiry
    is METADATA-ONLY — one driver-side dir listing plus the shared
    manifest commit; expired names commit as explicit removals, no
    partition is read or rewritten, untouched partitions stay
    byte-identical (pinned in tests/test_access_retention.py) — which is
    why expiring a day from a 100 TB store costs the same as from 100
    GB.  The oracle restates the kept rows from the base table."""
    import shutil
    import tempfile

    from localsql_spark.sinks.merge import expire_partitions

    ev = load(spark, sf_dir)["events"]
    dated = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        "event_type")
    base = tempfile.mkdtemp(prefix="retention_")
    try:
        (dated.repartition(F.col("event_date"))
         .write.mode("overwrite").partitionBy("event_date").parquet(base))
        mx = dated.agg(F.max("event_date")).first()[0]
        import datetime
        cutoff = (datetime.date.fromisoformat(mx)
                  - datetime.timedelta(days=7)).isoformat()
        expire_partitions(base, "event_date", cutoff)
        out = (spark.read.parquet(base)
               .select("event_id", F.col("event_date").cast("string")
                       .alias("event_date"), "event_type"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query("feed_time_travel", oracle="""
WITH d AS (SELECT doc_id, lang, text,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 3 AS h3
           FROM documents)
SELECT doc_id, lang, 2 AS version, md5(concat('v2 ', text)) AS text_md5,
       1 AS of_batch
FROM d WHERE h3 <= 1
""")
def feed_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table state AS OF a feed batch
    (streaming.foreach_upsert.table_as_of — the reproducibility
    primitive: "the corpus exactly as the 2024-03-07 training run saw
    it", Delta's versionAsOf re-expressed over the engine's own durable
    change feed): replays the shared three-batch feed through batch 1
    and keeps each key's last applied image.  Only batch dirs <= the
    cutoff are opened (driver-side name filter — later batches are
    never read, pinned by a corruption test); one key-partitioned
    window over the replayed prefix.  The oracle states the exact
    mid-history table: every h3<=1 document at version 2 with the v2
    text — including keys batch 2 later updated, which is the point."""
    import shutil
    import tempfile

    from localsql_spark.streaming.foreach_upsert import (
        stream_upsert_with_feed, table_as_of)

    docs = load(spark, sf_dir)["documents"]
    src_dir = _feed_src_fixture(spark, docs, sf_dir)
    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    scratch = Path(tempfile.mkdtemp(prefix="timetravel_"))
    try:
        stream_upsert_with_feed(
            spark, source_dir=str(src_dir), schema=schema,
            key="doc_id", version="version",
            out_dir=str(scratch / "table"),
            feed_dir=str(scratch / "feed"),
            checkpoint_dir=str(scratch / "ck"))
        state = table_as_of(spark, str(scratch / "feed"),
                            key="doc_id", batch_id=1)
        out = state.select(
            "doc_id", "lang", F.col("version").cast("int").alias("version"),
            F.md5("text").alias("text_md5"),
            F.col("_as_of_batch").cast("int").alias("of_batch"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("knn_jl_top5", oracle="""
WITH sj AS (SELECT CAST(j AS INT) AS j, CAST(kk AS INT) AS kk,
       CASE WHEN CAST('0x' || substr(md5(concat('jl:', CAST(j AS VARCHAR),
                  ':', CAST(kk AS VARCHAR))), 1, 8) AS BIGINT) % 2 = 0
            THEN 1.0 ELSE -1.0 END AS s
     FROM UNNEST(range(0, 64)) a(j), UNNEST(range(0, 16)) b(kk)),
ve AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
              CAST(unnest(embedding) AS DOUBLE) AS x
       FROM embeddings),
proj AS (SELECT vec_id, kk,
                round(CAST(SUM(CAST(round(x * s, 12) AS DECIMAL(28,12)))
                           AS DOUBLE) / sqrt(16.0), 9) AS p
         FROM ve JOIN sj USING (j) GROUP BY vec_id, kk),
norms AS (SELECT vec_id,
                 sqrt(CAST(SUM(CAST(round(p * p, 12) AS DECIMAL(28,12)))
                      AS DOUBLE)) AS nrm
          FROM proj GROUP BY vec_id),
q AS (SELECT vec_id AS query_id, kk, p FROM proj WHERE vec_id < 10),
dots AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                CAST(SUM(CAST(round(q.p * c.p, 12) AS DECIMAL(28,12)))
                     AS DOUBLE) AS dotp
         FROM q JOIN proj c ON q.kk = c.kk AND c.vec_id <> q.query_id
         GROUP BY 1, 2),
scored AS (SELECT query_id, neighbor_id,
                  round(dotp / (nq.nrm * nc.nrm), 9) AS cos_sim
           FROM dots JOIN norms nq ON nq.vec_id = query_id
                     JOIN norms nc ON nc.vec_id = neighbor_id)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored) ranked
WHERE rn <= 5
""")
def knn_jl_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projected kNN
    (operators.similarity.jl_project + knn_jl — Achlioptas PODS 2001):
    corpus and queries project row-locally to 16 dims through the
    hash-derived ±1 matrix (4x compression, no shuffle, no Python),
    then exact cosine top-5 runs in the projected space — every pair
    costs 1/4 of the full-space scan, the cheap shortlist stage of a
    shortlist -> full-vector rerank cascade.  The oracle replays the
    sign matrix from the same md5 idiom, the projection's decimal fold,
    the 9-decimal component rounding, and the projected-space cosine
    bit-for-bit — the DRAWN MATRIX is hash-verified cross-engine, not
    just the output shape."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.knn_jl(emb, emb.filter(F.col("vec_id") < 10), k=5,
                    out_dim=16, dim=64)


@query("dp_release_value_sums", oracle="""
WITH agg AS (
  SELECT event_type,
         CAST(SUM(CAST(round(least(greatest(CAST(value AS DOUBLE), 0.0),
                                   100.0), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS s,
         count(*) AS n
  FROM events GROUP BY event_type HAVING count(*) >= 5),
noised AS (
  SELECT event_type, s,
         ((CAST(CAST('0x' || substr(md5(
             concat_ws(chr(31), 'dp-sums', 'sums|eps=1|clip=100',
                       COALESCE(CAST(event_type AS VARCHAR), '<null>'))),
             1, 8) AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
         - 0.5 AS u
  FROM agg)
SELECT event_type,
       round(s + (-100.0) * sign(u) * ln(1 - 2 * abs(u)), 6) AS noisy_sum
FROM noised
""")
def dp_release_value_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private value totals (sinks.erase.dp_noisy_sums):
    per-event-type sums of `value` released with contribution bounding
    (each row clipped to [0,100] — the step that gives a sum finite
    sensitivity at all), k-suppression of classes under 5, and seeded
    Laplace(clip/eps) noise at eps=1.  The clipped sum is an exact
    decimal fold, so released-minus-true is exactly the noise term —
    and the oracle replays clip, fold, and draw bit-for-bit, verifying
    the MECHANISM cross-engine.  One map-side-combined groupBy + row-
    local noise; class-count-sized output at any scale."""
    from localsql_spark.sinks.erase import dp_noisy_sums

    ev = load(spark, sf_dir)["events"]
    return dp_noisy_sums(ev, ["event_type"], "value", epsilon=1.0,
                         clip=100.0, min_class=5, seed="dp-sums")


def _pca_oracle(rounds: int = 6) -> str:
    """Unrolled-CTE oracle for pca_pc1_scores (the PageRank discipline:
    the fixed iteration count is generated, never hand-maintained):
    exact covariance, `rounds` power-iteration rounds, centered
    projection — every fold the decimal-sum discipline."""
    parts = ["""
WITH ve AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
pairs AS (SELECT a.j, a.x, b.j AS k, b.x AS y
          FROM ve a JOIN ve b USING (vec_id)),
sxy AS (SELECT j, k,
               CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12)))
                    AS DOUBLE) AS sxy
        FROM pairs GROUP BY j, k),
means AS MATERIALIZED (
    SELECT j, round(CAST(SUM(CAST(round(x, 12) AS DECIMAL(28,12)))
                         AS DOUBLE) / (SELECT n FROM nn), 12) AS m
    FROM ve GROUP BY j),
cov AS MATERIALIZED (
    SELECT s.j, s.k,
           round(round(s.sxy / (SELECT n FROM nn), 12)
                 - mj.m * mk.m, 12) AS cov
    FROM sxy s JOIN means mj ON mj.j = s.j
               JOIN means mk ON mk.j = s.k),
pit0 AS (SELECT DISTINCT j, 1.0 AS vj FROM cov)"""]
    prev = "pit0"
    for t in range(1, rounds + 1):
        parts.append(f""",
pw{t} AS MATERIALIZED (
    SELECT c.j,
           CAST(SUM(CAST(round(c.cov * p.vj, 12) AS DECIMAL(28,12)))
                AS DOUBLE) AS w
    FROM cov c JOIN {prev} p ON c.k = p.j GROUP BY c.j),
pn{t} AS (SELECT sqrt(CAST(SUM(CAST(round(w * w, 12) AS DECIMAL(28,12)))
                           AS DOUBLE)) AS nrm FROM pw{t}),
pit{t} AS MATERIALIZED (
    SELECT j, CASE WHEN (SELECT nrm FROM pn{t}) = 0 THEN 0.0
              ELSE round(w / (SELECT nrm FROM pn{t}), 12) END AS vj
    FROM pw{t})""")
        prev = f"pit{t}"
    parts.append(f"""
SELECT ve.vec_id,
       round(CAST(SUM(CAST(round((ve.x - m.m) * p.vj, 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 9) AS pc1
FROM ve JOIN means m ON m.j = ve.j JOIN {prev} p ON p.j = ve.j
GROUP BY ve.vec_id""")
    return "".join(parts)


@query("pca_pc1_scores", oracle=_pca_oracle(rounds=6))
def pca_pc1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principal-component score per embedding
    (operators.similarity.covariance_matrix + power_iteration_top +
    pca_scores — the curation axis: sort/trim the corpus along its
    dominant direction of variation, the classical embedding-space
    outlier/drift view next to the per-cluster z-score gate).  Exact
    distributed covariance (dim^2-bounded shuffle whatever the corpus
    size), six power-iteration rounds kept in Spark ops so the DuckDB
    oracle replays them round-for-round (generated CTE chain, the
    PageRank discipline), then a row-local centered projection with
    the model-sized (mean, eigenvector) state as literal arrays —
    corpus rows never shuffle.  Every fold decimal-summed; the oracle
    replays covariance, all six rounds, AND the projection
    bit-for-bit."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.pca_scores(emb, rounds=6)


@query("xml_roundtrip_documents", oracle="""
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
FROM documents
""")
def xml_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink roundtrip at corpus size (sources.readers.read_xml
    + sinks.writers.export_result — Spark 4's NATIVE xml reader/writer,
    executor-side and splittable; an extension beyond the reference's
    csv/xlsx/json surface): the documents table writes to XML and reads
    back through the same dispatch the REPL's directory discovery uses.
    The oracle is the base table itself — the roundtrip must be exact
    through XML escaping, type inference, and the gz-capable text codec
    path (text is digested to md5 BEFORE the write so the compared
    payload is fixed-width; the digest column rides THROUGH the XML)."""
    import shutil
    import tempfile

    from localsql_spark.sinks.writers import export_result
    from localsql_spark.sources.readers import read_xml

    docs = load(spark, sf_dir)["documents"].select(
        "doc_id", "lang", "source", "n_chars",
        F.md5("text").alias("text_md5"))
    scratch = tempfile.mkdtemp(prefix="xmlrt_")
    try:
        out = f"{scratch}/docs.xml"
        export_result(docs, out)
        back = read_xml(spark, out).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("lang").cast("string").alias("lang"),
            F.col("source").cast("string").alias("source"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("text_md5").cast("string").alias("text_md5"))
        return back.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_PCA_COV_PREFIX = """
WITH ve AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
pairs AS (SELECT a.j, a.x, b.j AS k, b.x AS y
          FROM ve a JOIN ve b USING (vec_id)),
sxy AS (SELECT j, k,
               CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12)))
                    AS DOUBLE) AS sxy
        FROM pairs GROUP BY j, k),
means AS MATERIALIZED (
    SELECT j, round(CAST(SUM(CAST(round(x, 12) AS DECIMAL(28,12)))
                         AS DOUBLE) / (SELECT n FROM nn), 12) AS m
    FROM ve GROUP BY j),
cov AS MATERIALIZED (
    SELECT s.j, s.k,
           round(round(s.sxy / (SELECT n FROM nn), 12)
                 - mj.m * mk.m, 12) AS cov
    FROM sxy s JOIN means mj ON mj.j = s.j
               JOIN means mk ON mk.j = s.k)"""


def _power_chain(src: str, prefix: str, rounds: int) -> tuple[str, str]:
    """Emit a power-iteration CTE chain over matrix CTE ``src``; returns
    (sql_fragment, final_vector_cte_name)."""
    parts = [f""",
{prefix}0 AS (SELECT DISTINCT j, 1.0 AS vj FROM {src})"""]
    prev = f"{prefix}0"
    for t in range(1, rounds + 1):
        parts.append(f""",
{prefix}w{t} AS MATERIALIZED (SELECT c.j,
                 CAST(SUM(CAST(round(c.cov * p.vj, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) AS w
          FROM {src} c JOIN {prev} p ON c.k = p.j GROUP BY c.j),
{prefix}n{t} AS (SELECT sqrt(CAST(SUM(CAST(round(w * w, 12)
                                           AS DECIMAL(28,12)))
                                  AS DOUBLE)) AS nrm FROM {prefix}w{t}),
{prefix}{t} AS MATERIALIZED (
    SELECT j, CASE WHEN (SELECT nrm FROM {prefix}n{t}) = 0 THEN 0.0
              ELSE round(w / (SELECT nrm FROM {prefix}n{t}), 12) END AS vj
    FROM {prefix}w{t})""")
        prev = f"{prefix}{t}"
    return "".join(parts), prev


def _pca_explained_oracle(rounds: int = 6) -> str:
    chain1, v1 = _power_chain("cov", "pa", rounds)
    lam1 = f""",
law1 AS MATERIALIZED (SELECT c.j,
                CAST(SUM(CAST(round(c.cov * p.vj, 12) AS DECIMAL(28,12)))
                     AS DOUBLE) AS w
         FROM cov c JOIN {v1} p ON c.k = p.j GROUP BY c.j),
lam1 AS MATERIALIZED (SELECT round(CAST(SUM(CAST(round(l.w * p.vj, 12)
                                    AS DECIMAL(28,12))) AS DOUBLE), 12)
                AS lam
         FROM law1 l JOIN {v1} p ON l.j = p.j),
tr AS (SELECT CAST(SUM(CAST(round(cov, 12) AS DECIMAL(28,12)))
              AS DOUBLE) AS trace FROM cov WHERE j = k),
cov2 AS MATERIALIZED (
    SELECT c.j, c.k,
           round(c.cov - (SELECT lam FROM lam1) * pj.vj * pk.vj, 12)
             AS cov
    FROM cov c JOIN {v1} pj ON pj.j = c.j
               JOIN {v1} pk ON pk.j = c.k)"""
    chain2, v2 = _power_chain("cov2", "pb", rounds)
    lam2 = f""",
lbw1 AS MATERIALIZED (SELECT c.j,
                CAST(SUM(CAST(round(c.cov * p.vj, 12) AS DECIMAL(28,12)))
                     AS DOUBLE) AS w
         FROM cov2 c JOIN {v2} p ON c.k = p.j GROUP BY c.j),
lam2 AS MATERIALIZED (SELECT round(CAST(SUM(CAST(round(l.w * p.vj, 12)
                                    AS DECIMAL(28,12))) AS DOUBLE), 12)
                AS lam
         FROM lbw1 l JOIN {v2} p ON l.j = p.j)"""
    tail = """
SELECT 1 AS component, lam AS eigenvalue, trace,
       round(lam / trace, 9) AS ratio FROM lam1, tr
UNION ALL
SELECT 2, lam, trace, round(lam / trace, 9) FROM lam2, tr"""
    return _PCA_COV_PREFIX + chain1 + lam1 + chain2 + lam2 + tail


@query("pca_explained_variance", oracle=_pca_explained_oracle(rounds=6))
def pca_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 eigenvalues + explained-variance ratios of the embedding
    covariance (operators.similarity.pca_explained: power iteration,
    Hotelling deflation C - lam*v*vT, diagonal trace fold — all in Spark
    ops over the model-sized matrix).  The curation dashboard number: a
    near-1 top ratio flags a degenerate axis dominating the corpus
    BEFORE it skews training.  The oracle replays covariance, BOTH
    six-round power chains, the deflation, and the trace bit-for-bit
    (generated CTEs, the PageRank discipline)."""
    emb = load(spark, sf_dir)["embeddings"]
    cov = S.covariance_matrix(emb)
    return S.pca_explained(cov, rounds=6)


@query("pca_cov_incremental", oracle=_PCA_COV_PREFIX + """
SELECT j, k, cov FROM cov
""")
def pca_cov_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained covariance store
    (sinks.cov_store: fold/read/erase): the embeddings land as THREE
    ingest batches of exact decimal sufficient statistics (n, per-dim
    sums, per-pair product sums — purely additive, so
    fold(a);fold(b);fold(c) == one full pass bit-for-bit), and the
    matrix re-derives from the model-sized state without ever
    re-reading the corpus — the daily-loop shape for PCA over a growing
    corpus.  The oracle is the ONE-SHOT covariance computation itself
    (shared with pca_pc1_scores), so the driver row proves
    incremental == full exactly.  Per-day cost at 100 TB: one
    batch-sized expand + a model-sized append + a model-sized read."""
    import shutil
    import tempfile

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.cov_store import cov_from_store, cov_store_fold

    emb = load(spark, sf_dir)["embeddings"]
    store = tempfile.mkdtemp(prefix="cov_store_")
    try:
        for i in range(3):
            cov_store_fold(spark, store,
                           emb.filter(hash32(F.col("vec_id")) % 3 == i),
                           batch_id=i)
        return cov_from_store(spark, store).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)


@query("streaming_cov_ingest", oracle=_PCA_COV_PREFIX + """
SELECT j, k, cov FROM cov
""")
def streaming_cov_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the covariance store, driven end-to-end
    (streaming.stream_cov_ingest — the streaming twin of
    sinks.cov_store, keeping the one-twin-per-persisted-store
    invariant): the embeddings arrive as an mtime-ordered file stream
    (maxFilesPerTrigger=1, availableNow), each micro-batch lands its
    exact decimal sufficient statistics as an idempotent batch dir, and
    the matrix re-derives from the model-sized state.  Sharing the
    one-shot covariance oracle proves streamed ingest == the full-pass
    computation bit-for-bit — the invariance a continuously-maintained
    PCA input must hold under any delivery schedule."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from localsql_spark.catalog import _CACHE_DIR
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.cov_store import cov_from_store
    from localsql_spark.streaming.stream_cov_ingest import stream_cov_ingest

    emb = load(spark, sf_dir)["embeddings"]
    m = F.pmod(hash32(F.col("vec_id")), F.lit(3))
    src_dir = (_CACHE_DIR.parent / "stream_cov_src"
               / Path(sf_dir.rstrip("/")).name)
    if not src_dir.exists():
        src_dir.parent.mkdir(parents=True, exist_ok=True)
        build = Path(tempfile.mkdtemp(prefix=f".{src_dir.name}.build_",
                                      dir=src_dir.parent))
        names = ("a_batch0.parquet", "b_batch1.parquet", "c_batch2.parquet")
        for i, name in enumerate(names):
            tmp = tempfile.mkdtemp(prefix="covsplit_")
            emb.filter(m == i).coalesce(1) \
                .write.mode("overwrite").parquet(tmp)
            part = next(Path(tmp).glob("part-*.parquet"))
            shutil.move(str(part), build / name)
            shutil.rmtree(tmp, ignore_errors=True)
        t0 = (build / names[0]).stat().st_mtime
        for i, name in enumerate(names):
            os.utime(build / name, (t0 + 100 * i, t0 + 100 * i))
        try:
            os.rename(build, src_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)

    schema = spark.read.parquet(str(src_dir / "a_batch0.parquet")).schema
    store = tempfile.mkdtemp(prefix="cov_stream_")
    ck = tempfile.mkdtemp(prefix="cov_stream_ck_")
    try:
        stream_cov_ingest(spark, source_dir=str(src_dir), schema=schema,
                          store_dir=store, checkpoint_dir=ck)
        return cov_from_store(spark, store).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)


@query("drift_psi_click_vs_purchase", oracle="""
WITH ref AS (SELECT CAST(value AS DOUBLE) AS v, event_id FROM events
             WHERE event_type = 'click' AND value IS NOT NULL),
cur AS (SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL),
s AS (SELECT v,
             CAST('0x' || substr(md5('qsk:' || CAST(event_id AS VARCHAR)),
                  1, 8) AS BIGINT) AS rk
      FROM ref ORDER BY rk, v LIMIT 1024),
r AS (SELECT v, row_number() OVER (ORDER BY v, rk) AS rn,
             count(*) OVER () AS n FROM s),
qs AS (SELECT i / 10.0 AS q FROM UNNEST(range(1, 10)) t(i)),
ed AS (SELECT v AS e FROM r JOIN qs
       ON rn = CAST(floor(q * (n - 1)) AS BIGINT) + 1),
rb AS (SELECT (SELECT count(*) FROM ed WHERE ref.v > ed.e) AS bucket
       FROM ref),
cb AS (SELECT (SELECT count(*) FROM ed WHERE cur.v > ed.e) AS bucket
       FROM cur),
rp AS (SELECT bucket, greatest(CAST(count(*) AS DOUBLE)
                               / (SELECT count(*) FROM rb), 1e-6) AS p
       FROM rb GROUP BY bucket),
cp AS (SELECT bucket, greatest(CAST(count(*) AS DOUBLE)
                               / (SELECT count(*) FROM cb), 1e-6) AS p
       FROM cb GROUP BY bucket),
spine AS (SELECT CAST(i AS INT) AS bucket FROM UNNEST(range(0, 10)) t(i)),
terms AS (SELECT s.bucket,
                 COALESCE(rp.p, 1e-6) AS p_ref,
                 COALESCE(cp.p, 1e-6) AS p_cur,
                 round((COALESCE(cp.p, 1e-6) - COALESCE(rp.p, 1e-6))
                       * ln(COALESCE(cp.p, 1e-6) / COALESCE(rp.p, 1e-6)),
                       12) AS psi_term
          FROM spine s LEFT JOIN rp ON rp.bucket = s.bucket
                       LEFT JOIN cp ON cp.bucket = s.bucket),
tot AS (SELECT round(CAST(SUM(CAST(psi_term AS DECIMAL(28,12)))
                          AS DOUBLE), 6) AS psi_total FROM terms)
SELECT bucket, round(p_ref, 12) AS p_ref, round(p_cur, 12) AS p_cur,
       psi_term, psi_total
FROM terms, tot
""")
def drift_psi_click_vs_purchase(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor
    (operators.sketches.psi_drift): the `value` distribution of
    purchase events checked against click events as the reference —
    the DISTRIBUTIONAL drift question (has the population moved?) next
    to fingerprint_diff's exact row-level one.  Reference deciles from
    the portable bottom-k sketch define the binning (as PSI
    prescribes), one row-local assignment + one 10-row groupBy per
    side, 1e-6 empty-bucket clamp, per-bucket terms rounded to 12 and
    decimal-summed.  The oracle replays sketch, edges, both bucket
    passes, the clamp, and the index arithmetic bit-for-bit."""
    from localsql_spark.operators.sketches import psi_drift

    ev = load(spark, sf_dir)["events"]
    return psi_drift(ev.filter(F.col("event_type") == "click"),
                     ev.filter(F.col("event_type") == "purchase"),
                     "value", "event_id", n_buckets=10)



def _pca_project_oracle(rounds: int = 6) -> str:
    """Top-2 projection oracle: the explained-variance chains plus TWO
    centered projections joined on vec_id."""
    chain1, v1 = _power_chain("cov", "pa", rounds)
    lam1 = f""",
law1 AS MATERIALIZED (SELECT c.j,
                CAST(SUM(CAST(round(c.cov * p.vj, 12) AS DECIMAL(28,12)))
                     AS DOUBLE) AS w
         FROM cov c JOIN {v1} p ON c.k = p.j GROUP BY c.j),
lam1 AS MATERIALIZED (SELECT round(CAST(SUM(CAST(round(l.w * p.vj, 12)
                                    AS DECIMAL(28,12))) AS DOUBLE), 12)
                AS lam
         FROM law1 l JOIN {v1} p ON l.j = p.j),
cov2 AS MATERIALIZED (
    SELECT c.j, c.k,
           round(c.cov - (SELECT lam FROM lam1) * pj.vj * pk.vj, 12)
             AS cov
    FROM cov c JOIN {v1} pj ON pj.j = c.j
               JOIN {v1} pk ON pk.j = c.k)"""
    chain2, v2 = _power_chain("cov2", "pb", rounds)
    tail = f"""
,p1 AS (SELECT ve.vec_id,
       round(CAST(SUM(CAST(round((ve.x - m.m) * p.vj, 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 9) AS pc1
FROM ve JOIN means m ON m.j = ve.j JOIN {v1} p ON p.j = ve.j
GROUP BY ve.vec_id),
p2 AS (SELECT ve.vec_id,
       round(CAST(SUM(CAST(round((ve.x - m.m) * p.vj, 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 9) AS pc2
FROM ve JOIN means m ON m.j = ve.j JOIN {v2} p ON p.j = ve.j
GROUP BY ve.vec_id)
SELECT p1.vec_id, p1.pc1, p2.pc2 FROM p1 JOIN p2 USING (vec_id)"""
    return _PCA_COV_PREFIX + chain1 + lam1 + chain2 + tail


@query("pca_project_top2", oracle=_pca_project_oracle(rounds=6))
def pca_project_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal-component projection of every embedding
    (operators.similarity.pca_project — the dimensionality REDUCER the
    PCA arc exists for: 64 dims down to the 2-axis curation view,
    decorrelated features for cheap downstream clustering).  Repeated
    Hotelling deflation finds the axes in oracle-replayable Spark ops;
    the projection itself is one row-local pass with dim*(k+1) doubles
    of collected model state — the corpus never shuffles.  The oracle
    replays covariance, both six-round chains, the deflation, and BOTH
    centered projections bit-for-bit — which is why this entry pins
    method='exact': it IS the oracle twin of the covariance fold.  The
    production default (method='arrow', the per-partition numpy
    accumulator that killed the O(N*dim^2) decimal wall) is gated by
    pca_project_arrow_top10 against this exact path."""
    emb = load(spark, sf_dir)["embeddings"]
    return S.pca_project(emb, n_components=2, rounds=6, method="exact")


def _pca_arrow_gate_oracle(rounds: int = 6) -> str:
    """Top-10-by-pc1 oracle replaying the EXACT covariance fold + power
    chain — the gate pca_project_arrow_top10 runs the ARROW fold
    against."""
    chain1, v1 = _power_chain("cov", "pa", rounds)
    tail = f"""
,p1 AS (SELECT ve.vec_id,
       round(CAST(SUM(CAST(round((ve.x - m.m) * p.vj, 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 9) AS pc1
FROM ve JOIN means m ON m.j = ve.j JOIN {v1} p ON p.j = ve.j
GROUP BY ve.vec_id)
SELECT CAST(row_number() OVER (ORDER BY pc1 DESC, vec_id) AS INT) AS rn,
       vec_id, round(pc1, 3) AS pc1_approx
FROM p1 ORDER BY pc1 DESC, vec_id LIMIT 10"""
    return _PCA_COV_PREFIX + chain1 + tail


@query("pca_project_arrow_top10", oracle=_pca_arrow_gate_oracle(rounds=6))
def pca_project_arrow_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARROW covariance path (covariance_and_means_arrow: one
    dim x dim numpy outer-product partial per partition inside
    mapInPandas, order-exact decimal reduce over the model-sized
    partials — the production fold that killed pca_project_top2's
    O(N*dim^2) decimal-product scale curve, SCALE.md round 13) gated
    against the EXACT fold: the oracle replays the exact-decimal
    covariance + six-round power chain, and this query runs the float
    twin — agreement on the top-10 pc1 ranking (ids, order, 3-decimal
    scores) is the measured float-twin equivalence bound (ANN.md: cov
    entries within 1e-12, pc scores within 2e-9 — three orders below
    the ranking gaps) holding end-to-end.  A regression in the Arrow
    accumulator (batch handling, partial rounding, the reduce) breaks
    the hash."""
    from pyspark.sql.window import Window

    emb = load(spark, sf_dir)["embeddings"]
    p = S.pca_project(emb, n_components=1, rounds=6, method="arrow")
    w = Window.orderBy(F.col("pc1").desc(), "vec_id")
    return (p.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("rn", "vec_id",
                    F.round("pc1", 3).alias("pc1_approx")))


# ---------------------------------------------------------------------------
# Composed maintenance: maintain_everywhere (round 12)
# ---------------------------------------------------------------------------

_IVF_ASSIGN_CTES = """
icents AS (SELECT vec_id AS cell, embedding AS cent FROM embeddings
           WHERE vec_id < 16),
inorms AS (SELECT vec_id,
                  sqrt(CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
                                AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
           FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ne
           GROUP BY vec_id),
ive AS (SELECT vec_id, generate_subscripts(embedding, 1) AS p,
               unnest(embedding) AS x FROM embeddings),
ice AS (SELECT cell, generate_subscripts(cent, 1) AS p, unnest(cent) AS y
        FROM icents),
icelldots AS (SELECT vec_id, cell,
                     CAST(SUM(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
                              AS DECIMAL(38,12))) AS DOUBLE) AS dotp
              FROM ive JOIN ice ON ive.p = ice.p GROUP BY vec_id, cell),
icellsim AS (SELECT cd.vec_id, cd.cell,
                    round(dotp / (nv.nrm * nc.nrm), 9) AS csim
             FROM icelldots cd JOIN inorms nv ON nv.vec_id = cd.vec_id
                               JOIN inorms nc ON nc.vec_id = cd.cell),
iranked AS (SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cell) AS crn
            FROM icellsim),
icassign AS (SELECT vec_id AS neighbor_id, cell FROM iranked WHERE crn = 1)"""


@query("maintain_everywhere_probe", oracle=_PCA_COV_PREFIX + "," +
       _IVF_ASSIGN_CTES + """
SELECT * FROM (
  SELECT 'cov_store' AS store, CAST(count(*) AS BIGINT) AS n_rows,
         round(CAST(SUM(CAST(round(cov * (j * 64 + k + 1), 12)
                             AS DECIMAL(38,12))) AS DOUBLE), 6) AS checksum
  FROM cov
  UNION ALL
  SELECT 'feed', CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS DOUBLE)
  FROM documents
  UNION ALL
  SELECT 'ivf_index', CAST(count(*) AS BIGINT),
         CAST(sum(neighbor_id * 131 + cell) AS DOUBLE)
  FROM icassign
  UNION ALL
  SELECT 'ledger', CAST(3 AS BIGINT), CAST(303 AS DOUBLE)
  UNION ALL
  SELECT 'primary', CAST(count(*) AS BIGINT),
         round(CAST(sum(CAST(round(n_chars, 6) AS DECIMAL(28,6)))
                    AS DOUBLE), 6)
  FROM documents
  UNION ALL
  SELECT 'rollup', CAST(count(*) AS BIGINT),
         round(CAST(sum(s) AS DOUBLE), 6)
  FROM (SELECT CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6)))
               AS DECIMAL(28,6)) AS s
        FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-10'
        GROUP BY date_trunc('hour', ts), event_type) g
  UNION ALL
  SELECT 'signature_store', CAST(count(*) AS BIGINT),
         CAST(sum(h % 1000000) AS DOUBLE)
  FROM (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) AS h
        FROM documents) t
  WHERE h % 4 = 0
) ORDER BY store
""")
def maintain_everywhere_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed nightly maintenance pass
    (sinks.maintenance.maintain_everywhere — heal, compact, retain,
    sidecar-sync over the whole persisted-store farm under ONE audit,
    symmetric to erase_everywhere composing the erases).  Fixture: a
    debris-laden farm built once per sf — sliver-filed primary store,
    three-append signature store, full hourly rollup, three cov-partial
    batches, IVF base + delta, three consumed feed batches, three
    ledger requests — hardlink-copied per call (every store mutation is
    staged-write + rename, so the fixture's bytes can never be written
    through a link).  The probe runs the one-pass maintenance, asserts
    the audit counted exactly the expected work (compactions where
    debris existed, retention where policy applied, ZERO units on
    everything else), asserts the layout goals directly (<=1 file per
    primary partition, no landing dirs left in the signature store),
    re-checks content the heavy way in-plan (maintained signature
    store == recomputed signatures; the sidecar-SYNC leg is
    content-pinned in tests/test_maintenance.py — its cost is a
    256-dir hive write, file ops the bench should not price as data
    work), and returns one
    (store, n_rows, checksum) row per store read from the
    POST-maintenance bytes.  The oracle recomputes every store's
    content summary from the raw tables — equality proves maintenance
    is purely a layout/retention operation: nothing lost, duplicated,
    or altered anywhere it touched, and retention dropped exactly the
    policy's partitions.  SCALE.md: the pass costs debris + retention
    work, not store size."""
    import os
    import shutil
    import tempfile

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.cov_store import cov_from_store, cov_store_fold
    from localsql_spark.sinks.erase import bucket_of, erase_ledger_append
    from localsql_spark.sinks.maintenance import maintain_everywhere
    from localsql_spark.sinks.rollup import maintain_rollup, read_rollup
    from localsql_spark.streaming.batch_dirs import read_batches
    from localsql_spark.streaming.foreach_upsert import commit_feed_offset

    tabs = load(spark, sf_dir)
    docs, ev, emb = tabs["documents"], tabs["events"], tabs["embeddings"]
    sig_docs = docs.filter(hash32(F.col("doc_id")) % 4 == 0)
    is_delta = (F.col("vec_id") >= 16) & (F.col("vec_id") % 5 == 3)

    fixture = (Path(__file__).resolve().parent.parent.parent / ".cache"
               / "maintain_farm" / Path(sf_dir.rstrip("/")).name)
    marker = fixture / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(fixture, ignore_errors=True)
        fixture.mkdir(parents=True, exist_ok=True)
        # primary: the pre-clustered-writes layout (slivers per bucket)
        (docs.select("doc_id", "lang", "n_chars")
         .withColumn("kb", bucket_of(F.col("doc_id"), 8))
         .repartition(8).write.partitionBy("kb")
         .parquet(str(fixture / "primary")))
        # signature store: three append batches of flat files
        thirds = [sig_docs.filter(F.col("doc_id") % 3 == i)
                  for i in range(3)]
        D.write_signature_store(thirds[0], str(fixture / "sigs"))
        for t in thirds[1:]:
            D.append_signature_store(t, str(fixture / "sigs"))
        # full hourly rollup (retention applied by the maintenance pass)
        maintain_rollup(spark, str(fixture / "roll"), ev, grain="hour")
        # cov store: three partial batches
        for b in range(3):
            cov_store_fold(spark, str(fixture / "cov"),
                           emb.filter(F.col("vec_id") % 3 == b), b)
        # IVF: base + one delta batch (seeds vec_id < 16, oracle cents)
        S.write_ivf_index(emb.filter(~is_delta), str(fixture / "ivf"),
                          n_cells=16)
        S.append_ivf_index(spark, str(fixture / "ivf"),
                           emb.filter(is_delta), batch_id=1)
        # feed: three write-once batches, consumer caught up through 2
        h3 = hash32(F.col("doc_id")) % 3
        for b in range(3):
            (docs.filter(h3 <= b)
             .select("doc_id", F.lit(b + 1).alias("version"))
             .coalesce(1).write
             .parquet(str(fixture / "feed" / f"batch_{b}")))
        commit_feed_offset(str(fixture / "feed"), "etl", 2)
        # ledger: three singleton requests
        for b in range(3):
            erase_ledger_append(
                spark.createDataFrame([(100 + b,)], "doc_id long"),
                str(fixture / "ledger"), b)
        marker.touch()

    scratch = Path(tempfile.mkdtemp(prefix="maintain_farm_",
                                    dir=str(fixture.parent)))
    try:
        # hardlink farm: driver-side metadata ops with no shared state —
        # link the seven stores concurrently instead of walking them
        # one after another (guide §2.6 discipline applied to file ops)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(
                lambda store: shutil.copytree(fixture / store,
                                              scratch / store,
                                              copy_function=os.link),
                ("primary", "sigs", "roll", "cov", "ivf", "feed",
                 "ledger")))
        audit = maintain_everywhere(
            spark,
            primary={"base_dir": str(scratch / "primary")},
            # sidecar sync omitted HERE only for probe cost (a banded
            # rebuild is a 256-dir hive write — file ops, not data);
            # the sync leg is content-pinned in tests/test_maintenance.py
            signature_store={"store_path": str(scratch / "sigs"),
                             "max_files": 2},
            rollup={"rollup_dir": str(scratch / "roll"),
                    "retain_from": "2024-01-10"},
            cov_store={"store_dir": str(scratch / "cov")},
            ivf_index={"index_path": str(scratch / "ivf")},
            feed={"feed_dir": str(scratch / "feed")},
            ledger={"ledger_dir": str(scratch / "ledger")})
        a = {(r["store"], r["action"]): r["units"] for r in audit.collect()}
        expect = {("primary", "heal"): 0, ("signature_store", "heal"): 0,
                  ("signature_store", "compact"): 1, ("rollup", "heal"): 0,
                  ("rollup", "compact"): 0, ("rollup", "retain"): 9,
                  ("cov_store", "compact"): 2, ("ivf_index", "compact"): 1,
                  ("feed", "heal"): 0, ("feed", "retain"): 2,
                  ("ledger", "retain"): 2}
        bad = {k: (a.get(k), v) for k, v in expect.items()
               if a.get(k) != v}
        if bad or a[("primary", "compact")] < 1:
            raise AssertionError(f"maintenance audit off: {bad or a}")
        fat = [d.name for d in (scratch / "primary").glob("kb=*")
               if len(list(d.glob("*.parquet"))) > 1]
        if fat or any((scratch / "sigs").glob("batch_*")):
            raise AssertionError(f"layout goal missed: {fat}")
        # content re-check the heavy way: maintained sigs == recomputed
        # (counts compared via the returned n_rows row below; equal
        # counts + empty one-direction exceptAll == multiset equality)
        # both sides of the recheck are consumed three times (two counts
        # + exceptAll, and got_sigs again in the checksum row below) —
        # persist so the maintained-store read and the minhash recompute
        # each run once, not three times (r14: the recompute was the
        # probe's single heaviest stage, executed twice)
        from localsql_spark.operators import track_persist
        got_sigs = track_persist(
            D.read_signature_store(spark, str(scratch / "sigs")))
        want_sigs = track_persist(D.compute_signatures(sig_docs))
        if got_sigs.count() != want_sigs.count() \
                or not got_sigs.exceptAll(want_sigs).isEmpty():
            raise AssertionError("signature store diverged under compaction")

        dim = 64
        rows = [
            cov_from_store(spark, str(scratch / "cov")).agg(
                F.lit("cov_store").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum(F.round(F.col("cov")
                                      * (F.col("j") * dim + F.col("k") + 1),
                                      12).cast("decimal(38,12)"))
                        .cast("double"), 6).alias("checksum")),
            spark.read.parquet(
                *[str(p) for p in sorted((scratch / "feed")
                                         .glob("batch_*"))]).agg(
                F.lit("feed").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").cast("double").alias("checksum")),
            S._ivf_slices(spark, str(scratch / "ivf")).agg(
                F.lit("ivf_index").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("neighbor_id") * 131 + F.col("cell"))
                .cast("double").alias("checksum")),
            read_batches(spark, str(scratch / "ledger")).agg(
                F.lit("ledger").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("_erase_key").cast("double"))
                .alias("checksum")),
            spark.read.option("basePath", str(scratch / "primary"))
            .parquet(str(scratch / "primary")).agg(
                F.lit("primary").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum(F.round(F.col("n_chars"), 6)
                              .cast("decimal(28,6)")).cast("double"), 6)
                .alias("checksum")),
            read_rollup(spark, str(scratch / "roll")).agg(
                F.lit("rollup").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum(F.col("sum_value")).cast("double"), 6)
                .alias("checksum")),
            got_sigs.agg(
                F.lit("signature_store").alias("store"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(hash32(F.col("doc_id")) % 1000000).cast("double")
                .alias("checksum")),
        ]
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out.orderBy("store").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query("schema_evolution_probe", oracle="""
WITH h AS (SELECT doc_id, lang, n_chars,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS h32
           FROM documents)
SELECT doc_id, lang, n_chars,
       CAST(CASE WHEN h32 % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version,
       CASE WHEN h32 % 3 = 0 THEN round(n_chars / 100.0, 6)
            ELSE 0.5 END AS quality
FROM h WHERE h32 % 17 <> 0
""")
def schema_evolution_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution on a persisted store
    (sinks/schema_evolution.py — the registry-gated contract: evolution
    is a METADATA-ONLY commit, old bytes never rewritten, every read
    reconciles files from every schema vintage to the current contract
    with nulls/defaults).  The probe builds the bucketed primary store
    under its v1 schema, EVOLVES it (add ``quality double`` with
    default 0.5), merges a v2 batch carrying the new column for a
    deterministic 1/3 of keys (those buckets now hold evolved bytes
    next to v1 bytes), then erases a deterministic 1/17 ACROSS the
    boundary (the erase rewrite reads reconciled rows from both
    vintages — schema-version-safety of the compliance path), and
    reads the store back.  The oracle is the full rebuild on the
    evolved schema: merged keys at v2 with their real quality,
    untouched keys at v1 reading the declared default, erased keys
    absent — proving the evolution changed WHAT READS RETURN without
    touching, losing, or corrupting any stored byte it didn't merge.
    At 100 TB: evolving costs one registry rename (expire_partitions'
    metadata-only discipline applied to schema), and the reconciled
    read adds a footer-schema merge over only the files actually
    scanned."""
    import shutil
    import tempfile

    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import (bucket_of, erase_keys,
                                            read_bucketed_store,
                                            write_bucketed_store)
    from localsql_spark.sinks.merge import merge_into_partitioned
    from localsql_spark.sinks.schema_evolution import (evolve_schema,
                                                       init_schema)

    docs = load(spark, sf_dir)["documents"]
    h = hash32(F.col("doc_id"))
    base = tempfile.mkdtemp(prefix="schema_evo_")
    store = f"{base}/store"
    try:
        write_bucketed_store(
            docs.select("doc_id", "lang", "n_chars",
                        F.lit(1).cast("long").alias("version")),
            store, "doc_id", n_buckets=8)
        init_schema(store, {"doc_id": "bigint", "lang": "string",
                            "n_chars": "bigint", "version": "bigint"},
                    partition=("kb", "int"))
        evolve_schema(store, {"quality": "double"},
                      defaults={"quality": 0.5})
        upd = (docs.filter(h % 3 == 0)
               .select("doc_id", "lang", "n_chars",
                       F.lit(2).cast("long").alias("version"),
                       F.round(F.col("n_chars") / 100.0, 6)
                       .alias("quality"))
               .withColumn("kb", bucket_of(F.col("doc_id"), 8)))
        merge_into_partitioned(spark, store, upd, key="doc_id",
                               version="version", partition_col="kb")
        erase_keys(spark, store,
                   docs.filter(h % 17 == 0).select("doc_id"),
                   "doc_id", n_buckets=8)
        out = (read_bucketed_store(spark, store)
               .select("doc_id", "lang", "n_chars", "version", "quality"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query("access_aggregate_footprint", oracle="""
WITH k AS (SELECT DISTINCT user_id FROM events
           WHERE CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                      AS BIGINT) % 29 = 0)
SELECT e.user_id,
       strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:00:00') AS bucket_ts,
       e.event_type AS key,
       count(*) AS n_contributed
FROM events e JOIN k USING (user_id)
GROUP BY 1, 2, 3
""")
def access_aggregate_footprint(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The access manifest's AGGREGATE FOOTPRINT
    (sinks.erase.export_subject, rollup config — round-11 verdict task
    #7): the Art. 15 response keeps its principled row-exclusion for
    aggregate stores (no subject-addressable row survives in a
    count/sum; what the aggregate REVEALS is the DP release path's
    question), but now NAMES the subject's contributions — per
    subject, which (bucket_ts, key) groups of the maintained rollup
    hold their events and how many.  Computed from the subjects' own
    source rows (one broadcast semi-join + one batch-sized groupBy
    using the rollup's OWN bucket expression, so the disclosed group
    ids can never drift from the store's), never by reading aggregate
    bytes.  The oracle recomputes the touched-group list from the base
    table — the same from-scratch discipline as the erase probes, on
    the read side."""
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import export_subject

    ev = load(spark, sf_dir)["events"]
    keys = (ev.filter(hash32(F.col("user_id")) % 29 == 0)
            .select("user_id").distinct())
    exp = export_subject(spark, keys,
                         rollup={"events": ev, "subject_col": "user_id"})
    return (exp["rollup_footprint"]
            .select("user_id", "bucket_ts", "key", "n_contributed")
            .localCheckpoint(eager=True))


@query("access_model_footprint", oracle=r"""
WITH dk AS (SELECT DISTINCT doc_id FROM documents
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 17 = 0),
lab AS (SELECT d.doc_id, d.source,
               trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')) AS t
        FROM documents d JOIN dk USING (doc_id)),
w AS (SELECT doc_id, word FROM lab, UNNEST(string_split(t, ' ')) u(word)
      WHERE word <> ''),
nbf AS (SELECT 'nb_model' AS store, doc_id AS subject_key, word AS grp,
               count(*) AS n_contributed
        FROM w GROUP BY 2, 3),
tk AS (SELECT doc_id, source,
              len(list_filter(string_split(t, ' '), x -> x <> '')) AS nt
       FROM lab),
skf AS (SELECT 'sketch_view' AS store, doc_id AS subject_key,
               source AS grp,
               CAST(SUM(greatest(nt - 1, 0)) AS BIGINT) AS n_contributed
        FROM tk GROUP BY 2, 3),
vk AS (SELECT DISTINCT vec_id FROM embeddings
       WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 13 = 0),
cvf AS (SELECT 'cov_store' AS store, e.vec_id AS subject_key,
               '<all-cells>' AS grp, count(*) AS n_contributed
        FROM embeddings e JOIN vk USING (vec_id) GROUP BY 2)
SELECT store, subject_key, grp, n_contributed FROM nbf
UNION ALL SELECT store, subject_key, grp, n_contributed FROM skf
UNION ALL SELECT store, subject_key, grp, n_contributed FROM cvf
""")
def access_model_footprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The access manifest's MODEL-STORE footprints (verdict r12 task 6,
    completing access_aggregate_footprint's rollup/IVM coverage): the
    NB count model, the HLL diversity sketch view, and the covariance
    store all hold subject contributions that are not row-exportable
    (additive counts, register maxes, dim^2 partials — the
    rebuild_nonretractable state class), so the Art. 15 response NAMES
    them instead: per subject, which WORD rows of the NB model carry
    their tokens (the trainer's own _nb_words tokenizer), which GROUP
    rows of the sketch view carry their docs/n-grams (gram arithmetic
    identical to ngram_stream's emission), and how many vectors they
    contributed to the covariance partials.  Computed from the
    subjects' own source rows — one broadcast semi-join + one
    batch-sized groupBy per store, never an aggregate-bytes read.  The
    oracle recomputes every touched group from the base tables (the
    from-scratch discipline); the sketch footprint's n_docs_contributed
    column is pinned by the unit test (uniform 4-column shape here)."""
    from localsql_spark.operators import hash32
    from localsql_spark.sinks.erase import export_subject

    docs = load(spark, sf_dir)["documents"]
    emb = load(spark, sf_dir)["embeddings"]
    dkeys = (docs.filter(hash32(F.col("doc_id")) % 17 == 0)
             .select("doc_id").distinct())
    vkeys = (emb.filter(hash32(F.col("vec_id")) % 13 == 0)
             .select("vec_id").distinct())
    exp_d = export_subject(
        spark, dkeys,
        nb_model={"docs": docs, "subject_col": "doc_id"},
        sketch_view={"docs": docs, "subject_col": "doc_id",
                     "group_col": "source"})
    exp_v = export_subject(
        spark, vkeys,
        cov_store={"vectors": emb, "subject_col": "vec_id"})
    nbf = exp_d["nb_footprint"].select(
        F.lit("nb_model").alias("store"),
        F.col("doc_id").alias("subject_key"),
        F.col("word").alias("grp"), "n_contributed")
    skf = exp_d["sketch_footprint"].select(
        F.lit("sketch_view").alias("store"),
        F.col("doc_id").alias("subject_key"),
        F.col("grp"),
        F.col("n_ngrams_contributed").alias("n_contributed"))
    cvf = exp_v["cov_footprint"].select(
        F.lit("cov_store").alias("store"),
        F.col("vec_id").alias("subject_key"),
        F.lit("<all-cells>").alias("grp"),
        F.col("n_vectors").alias("n_contributed"))
    return nbf.unionByName(skf).unionByName(cvf)


# ---------------------------------------------------------------------------
# OPQ-lite: PCA-rotated residual PQ (round 12)
# ---------------------------------------------------------------------------

def _opq_rotation_oracle(dim: int = 8, rounds: int = 6) -> str:
    """Generated oracle for opq_rotation_basis: covariance of the
    dim-sliced embeddings, then ``dim`` power-iteration chains with
    Rayleigh + Hotelling deflation between them — the full eigenbasis,
    every chain the `_power_chain` idiom (MATERIALIZED per round, the
    non-MATERIALIZED-CTE cascade trap documented at _pca_oracle).
    Generated, never hand-maintained — the PageRank/BPE discipline."""
    prefix = f"""
WITH se AS (SELECT vec_id, CAST(embedding[1:{dim}] AS DOUBLE[]) AS v
            FROM embeddings),
ve AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(v, 1) - 1 AS j,
           CAST(unnest(v) AS DOUBLE) AS x
    FROM se),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM se),
pairs AS (SELECT a.j, a.x, b.j AS k, b.x AS y
          FROM ve a JOIN ve b USING (vec_id)),
sxy AS (SELECT j, k,
               CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12)))
                    AS DOUBLE) AS sxy
        FROM pairs GROUP BY j, k),
means AS MATERIALIZED (
    SELECT j, round(CAST(SUM(CAST(round(x, 12) AS DECIMAL(28,12)))
                         AS DOUBLE) / (SELECT n FROM nn), 12) AS m
    FROM ve GROUP BY j),
cov0 AS MATERIALIZED (
    SELECT s.j, s.k,
           round(round(s.sxy / (SELECT n FROM nn), 12)
                 - mj.m * mk.m, 12) AS cov
    FROM sxy s JOIN means mj ON mj.j = s.j
               JOIN means mk ON mk.j = s.k)"""
    parts = [prefix]
    selects = []
    src = "cov0"
    for c in range(dim):
        chain, v = _power_chain(src, f"e{c}x", rounds)
        parts.append(chain)
        selects.append(f"SELECT {c} AS r, j, vj AS w FROM {v}")
        if c + 1 < dim:
            parts.append(f""",
e{c}lw AS MATERIALIZED (SELECT c.j,
                CAST(SUM(CAST(round(c.cov * p.vj, 12) AS DECIMAL(28,12)))
                     AS DOUBLE) AS w
         FROM {src} c JOIN {v} p ON c.k = p.j GROUP BY c.j),
e{c}lam AS MATERIALIZED (SELECT round(CAST(SUM(CAST(round(l.w * p.vj, 12)
                                    AS DECIMAL(28,12))) AS DOUBLE), 12)
                AS lam
         FROM e{c}lw l JOIN {v} p ON l.j = p.j),
cov{c + 1} AS MATERIALIZED (
    SELECT c.j, c.k,
           round(c.cov - (SELECT lam FROM e{c}lam) * pj.vj * pk.vj, 12)
             AS cov
    FROM {src} c JOIN {v} pj ON pj.j = c.j
                 JOIN {v} pk ON pk.j = c.k)""")
            src = f"cov{c + 1}"
    tail = ("\nSELECT r, j, w FROM (\n"
            + "\nUNION ALL\n".join(selects) + "\n) basis")
    return "".join(parts) + tail


@query("opq_rotation_basis", oracle=_opq_rotation_oracle())
def opq_rotation_basis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPQ-lite rotation matrix itself, hash-verified cross-engine
    (operators.similarity.opq_rotation — Ge et al. CVPR 2013's
    parametric simplification: the full PCA eigenbasis of the residual
    covariance, computed as one distributed dim^2-bounded fold + dim
    DRIVER-SIDE power/deflation chains bit-identical to the in-plan
    operators).  Probed on the 8-dim slice of the embeddings so the
    oracle's generated chain count stays DuckDB-friendly (8 chains x 6
    rounds; the 64-dim production path runs the same code — the
    dimension is a loop bound, not a branch).  Any drift in the
    eigen-chain arithmetic, the Rayleigh estimate, the deflation
    rounding, or the chain ordering shows up as a hash mismatch on the
    full (r, j, w) matrix."""
    emb = load(spark, sf_dir)["embeddings"]
    sl = emb.select(
        "vec_id",
        F.transform(F.slice("embedding", 1, 8),
                    lambda x: x.cast("double")).alias("embedding"))
    R = S.opq_rotation(sl, "embedding", exact=True)
    return spark.createDataFrame(
        [(r, j, float(w)) for r, row in enumerate(R)
         for j, w in enumerate(row)], "r int, j int, w double")


@query("knn_ivfpq_rot_planted_top5", oracle=_PLANTED_IVF_ORACLE)
def knn_ivfpq_rot_planted_top5(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """ROTATED IVFADC (rotate=True — OPQ-lite) under the planted-cluster
    exact oracle, the knn_ivf_trained_planted_top5 discipline: on the
    planted transform (10*e_{id%16} + 0.05*x) the 16 coarse seeds land
    one per cluster, in-cluster ADC distances sit orders below
    cross-cluster ones WHATEVER near-orthogonal rotation is applied
    (an orthogonal transform preserves L2; the fixed-round eigenbasis
    is orthogonal to ~1e-3, perturbing distances orders below the
    planted separation), so an ADC shortlist of 150 >= the largest
    planted cluster provably contains the true top-5 and the exact
    cosine re-rank returns the global brute-force answer — closed-form
    for DuckDB.  A wrong rotation (non-orthogonal R, corpus/query
    rotation drift, residual handling) breaks the containment and the
    hash.  The rotation's VALUES are hash-verified separately by
    opq_rotation_basis; this gates the end-to-end rotated pipeline."""
    emb = load(spark, sf_dir)["embeddings"]
    c = (F.col("vec_id") % 16).cast("int")
    planted = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == c, F.lit(10.0)).otherwise(F.lit(0.0))
            + x.cast("double") * F.lit(0.05)).alias("embedding")) \
        .localCheckpoint(eager=True)  # the transform feeds assign,
    # rotation covariance, encode AND the exact rerank — evaluate once
    return S.knn_ivfpq_rerank(
        planted, planted.filter(F.col("vec_id") < 10), k=5,
        shortlist=150, n_cells=16, n_probe=4, m=4, k_codes=16,
        exclude_self=True, rotate=True)


@query("knn_ivfpq_rot_index_top5", oracle=_PLANTED_IVF_ORACLE)
def knn_ivfpq_rot_index_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rotated index's SERVING path (write_ivfpq_index(rotate=True)
    + knn_ivfpq_from_index + exact re-rank) — the steady-state twin of
    knn_ivfpq_rot_planted_top5, which prices the whole training
    composition in-query: here the rotated index is a content-stable
    per-sf fixture, so the timed wall is what a query batch actually
    costs at scale — two model reads (centroids, codebooks) PLUS the
    persisted rotation matrix, the frame-path rotation of the probe
    residuals, a partition-pruned scan of the probed cells' codes, and
    the exact cosine re-rank of the shortlist.  Shares the
    planted-cluster closed-form oracle: the shortlist (>= the largest
    cluster) provably contains the true top-5 whatever near-orthogonal
    rotation rides in the index, so serving == global brute force."""
    import shutil
    from pathlib import Path as _Path

    from pyspark.sql.window import Window

    from localsql_spark.operators.similarity import (
        _collect_query_vectors, arrow_cosine_lookup)

    emb = load(spark, sf_dir)["embeddings"]
    c = (F.col("vec_id") % 16).cast("int")
    planted = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == c, F.lit(10.0)).otherwise(F.lit(0.0))
            + x.cast("double") * F.lit(0.05)).alias("embedding")) \
        .localCheckpoint(eager=True)
    fixture = (_Path(__file__).resolve().parent.parent.parent / ".cache"
               / "ivfpq_rot" / _Path(sf_dir.rstrip("/")).name)
    marker = fixture / "_fixture_ok"
    if not marker.exists():
        shutil.rmtree(fixture, ignore_errors=True)
        fixture.mkdir(parents=True, exist_ok=True)
        S.write_ivfpq_index(planted, str(fixture / "idx"), n_cells=16,
                            m=4, k_codes=16, rotate=True)
        marker.touch()
    q = planted.filter(F.col("vec_id") < 10)
    cand = (S.knn_ivfpq_from_index(spark, str(fixture / "idx"), q, k=150,
                                   n_probe=4, exclude_self=True)
            .select("query_id", "neighbor_id"))
    nv = planted.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("cv"))
    re = arrow_cosine_lookup(  # one Arrow map: dot + norms (r14);
        # query vectors ride the task closure, not a broadcast join
        nv.join(F.broadcast(cand), "neighbor_id"),
        "cos_sim", "query_id", "cv",
        _collect_query_vectors(q, "vec_id", "embedding"),
        keep=["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               "neighbor_id")
    return (re.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5).localCheckpoint(eager=True))
