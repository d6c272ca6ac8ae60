"""Multimodal workload: binary media columns + Arrow-batched feature
extraction / frame sampling (operators.multimodal). The fake codec is pure
arithmetic on the payload bytes, so even the Python mapInPandas stages are
exact-oracle-checked (documents.text is ASCII, so DuckDB's VARCHAR functions
see the same bytes Spark's BINARY functions do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from localsql_spark.operators import multimodal as M
from localsql_spark.workload import load, query


@query("multimodal_features", oracle="""
WITH b AS (SELECT doc_id, text FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       ['png','jpeg','webp'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
       CAST((doc_id % 16 + 1) * 64 AS INT) AS width,
       CAST((doc_id % 9 + 1) * 64 AS INT) AS height,
       CAST(list_aggregate(list_transform(split(text, ''), x -> ascii(x)),
                           'sum') AS DOUBLE) / length(text) AS mean_byte
FROM b
""")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: attach blob + typed metadata, then Arrow-batched
    mapInPandas feature extraction (byte stats, md5 digest, fake-codec decode).
    Narrow map over the scan — zero shuffles
    (operators.multimodal.extract_features)."""
    docs = load(spark, sf_dir)["documents"]
    return M.extract_features(M.attach_fake_media(docs), codec="fake")


@query("multimodal_frame_sample", oracle="""
WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents)
SELECT doc_id, CAST(i AS INT) AS frame_no,
       CAST(i * 4096 AS BIGINT) AS "offset",
       md5(substring(text, CAST(i * 4096 + 1 AS BIGINT), 16)) AS frame_md5
FROM b CROSS JOIN UNNEST(range(CAST(ceil(n / 4096.0) AS BIGINT))) u(i)
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: one row per 4096-byte stride with a 16-byte
    frame digest — the explode/batch shape of a real frame sampler, stub
    codec (operators.multimodal.frame_sample)."""
    docs = load(spark, sf_dir)["documents"]
    return M.frame_sample(M.attach_fake_media(docs), every=4096, frame_len=16)


@query("multimodal_resize", oracle="""
WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
px AS (SELECT doc_id,
              string_agg(substr(text, CAST(1 + i * 4 AS BIGINT), 1),
                         '' ORDER BY i) AS sampled
       FROM b CROSS JOIN UNNEST(range(CAST(ceil(n / 4.0) AS BIGINT))) u(i)
       GROUP BY doc_id)
SELECT b.doc_id,
       CAST((b.doc_id % 16 + 1) * 64 / 2 AS INT) AS new_width,
       CAST((b.doc_id % 9 + 1) * 64 / 2 AS INT) AS new_height,
       CAST(length(sampled) AS BIGINT) AS n_bytes,
       md5(sampled) AS digest
FROM b JOIN px ON b.doc_id = px.doc_id
""")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Image resize' stage: stride-downsampled payload + halved dimensions
    via Arrow-batched mapInPandas (codec stubbed deterministically, plumbing
    real) — completes the decode/extract/resize/frame-sample multimodal set
    (operators.multimodal.resize_media)."""
    docs = load(spark, sf_dir)["documents"]
    return M.resize_media(M.attach_fake_media(docs), factor=2)


@query("multimodal_audio_energy", oracle="""
WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
w AS (SELECT doc_id, i,
             substring(text, CAST(i * 1024 + 1 AS BIGINT), 1024) AS seg
      FROM b CROSS JOIN UNNEST(range(CAST(ceil(n / 1024.0) AS BIGINT))) u(i)),
s AS (SELECT doc_id, i,
             list_transform(split(seg, ''), x -> ascii(x)) AS vals
      FROM w)
SELECT doc_id, CAST(i AS INT) AS window_no,
       CAST(len(vals) AS BIGINT) AS n_samples,
       round(sqrt(CAST(list_aggregate(list_transform(vals, x -> x * x),
                                      'sum') AS DOUBLE) / len(vals)), 9) AS rms,
       CAST(list_aggregate(vals, 'max') AS INT) AS peak
FROM s
""")
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Audio' per-window RMS energy + peak over the fake-PCM payload — the
    loudness/silence-filter primitive, Arrow-batched mapInPandas, exact
    (integer squared-sums, one division, round-9)
    (operators.multimodal.audio_energy)."""
    docs = load(spark, sf_dir)["documents"]
    return M.audio_energy(M.attach_fake_media(docs), window=1024)


# Shared pHash derivation (pooled pixels -> DCT -> sign bits); the DCT
# basis is derived independently by both engines from round(cos(...), 12) —
# probed exhaustively equal across JVM/DuckDB/Python and pinned by
# test_phash_basis_matches_python.
_PHASH_CTE = """
d AS (SELECT doc_id, text, length(text) AS L FROM documents
      WHERE length(text) > 0),
ch AS (SELECT doc_id, L, i, ascii(substr(text, CAST(i AS INT), 1)) AS code
       FROM d CROSS JOIN UNNEST(range(1, CAST(L + 1 AS BIGINT))) u(i)),
pool AS (SELECT doc_id, CAST(FLOOR((i - 1) * 64.0 / L) AS INT) AS b,
                round(CAST(SUM(code) AS DOUBLE) / COUNT(*), 6) AS px
         FROM ch GROUP BY 1, 2),
basis AS (SELECT u, b, round(cos(pi() * (2*b + 1) * u / 128.0), 12) AS w
          FROM generate_series(1, 32) g1(u)
          CROSS JOIN generate_series(0, 63) g2(b)),
co AS (SELECT doc_id, u,
              CAST(SUM(CAST(round(px * w, 12) AS DECIMAL(38,12)))
                   AS DOUBLE) AS coef
       FROM pool JOIN basis USING (b) GROUP BY 1, 2),
h AS (SELECT doc_id,
             CAST(SUM(CASE WHEN coef > 0
                           THEN (CAST(1 AS BIGINT) << (CAST(u AS INT) - 1))
                           ELSE 0 END) AS BIGINT) AS phash
      FROM co GROUP BY doc_id)"""


@query("multimodal_phash", oracle=f"""
WITH {_PHASH_CTE.lstrip()}
SELECT doc_id, phash FROM h
""")
def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perceptual hash: fake-codec pixel stream pooled to 64
    pixels, 32 low-frequency 1-D DCT-II coefficient signs — every bit of
    every document's hash exact-checked cross-engine
    (operators.multimodal.phash_features)."""
    docs = load(spark, sf_dir)["documents"]
    return M.phash_features(docs)


@query("multimodal_phash_pairs", oracle=f"""
WITH {_PHASH_CTE.lstrip()},
bv AS (SELECT doc_id, phash, k,
              (phash >> (k * 8)) & 255 AS band_val
       FROM h CROSS JOIN generate_series(0, 3) g(k)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.phash AS ha, b.phash AS hb
         FROM bv a JOIN bv b ON a.k = b.k AND a.band_val = b.band_val
                            AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
""")
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-duplicate pairs by perceptual hash: 32-bit pooled
    DCT pHash (see multimodal_phash), banded-hamming candidate generation
    (4 bands x 8 bits — a pair at hamming <= 3 must agree on >= 1 full
    band, so recall is exact without an all-pairs compare), verified by
    bit_count(xor) <= 3 — the SimHash/LSH discipline from operators.dedup
    applied to media (operators.multimodal.phash_pairs)."""
    docs = load(spark, sf_dir)["documents"]
    return M.phash_pairs(docs, max_hamming=3)


@query("multimodal_phash_pairs_capped", oracle=f"""
WITH rep AS (SELECT CAST(1000000 + i AS BIGINT) AS doc_id,
                    (SELECT text FROM documents WHERE doc_id = 0) AS text
             FROM range(12) t(i)),
docs2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM rep),
{_PHASH_CTE.lstrip().replace("FROM documents", "FROM docs2")},
keep AS (SELECT phash FROM h GROUP BY phash HAVING count(*) <= 10),
h2 AS (SELECT h.doc_id, h.phash FROM h JOIN keep USING (phash)),
bv AS (SELECT doc_id, phash, k,
              (phash >> (k * 8)) & 255 AS band_val
       FROM h2 CROSS JOIN generate_series(0, 3) g(k)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.phash AS ha, b.phash AS hb
         FROM bv a JOIN bv b ON a.k = b.k AND a.band_val = b.band_val
                            AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
""")
def multimodal_phash_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phash_pairs under ``group_cap`` — the media-dedup skew guard,
    oracle-gated: 12 planted replicas of document 0 form a 13-member
    pHash group (a mass-duplicate cluster whose pair list alone is
    C(13,2)=78 rows here and quadratic at scale); group_cap=10 excludes
    the over-cap group from BOTH expansion paths (the group listing
    still names it — exact_dedup's job), and the oracle replays the
    exclusion exactly, so the capped output is proven to be precisely
    'all pairs among under-cap groups', not an approximation.  Same
    discipline as minhash's bucket_cap (SKEW.md measures both)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir)["documents"]
    seed = docs.filter(F.col("doc_id") == 0).select("text")
    rep = (spark.range(12)
           .select((F.col("id") + 1_000_000).alias("doc_id"))
           .crossJoin(F.broadcast(seed)))
    docs2 = docs.select("doc_id", "text").unionByName(rep)
    return M.phash_pairs(docs2, max_hamming=3, group_cap=10)


# Shared audio-fingerprint derivation (round 12): the payload split into 2
# time windows, each pooled to 64 bins, 16 low-frequency DCT-II coefficient
# signs per window -> a 32-bit windowed spectral fingerprint.  Same
# cross-engine-pinned basis as pHash.
_AFP_CTE = """
ad AS (SELECT doc_id, text, length(text) AS L FROM documents
       WHERE length(text) > 0),
ach AS (SELECT doc_id, L, i, ascii(substr(text, CAST(i AS INT), 1)) AS code
        FROM ad CROSS JOIN UNNEST(range(1, CAST(L + 1 AS BIGINT))) u(i)),
ag AS (SELECT doc_id, CAST(FLOOR((i - 1) * 128.0 / L) AS INT) AS g, code
       FROM ach),
apool AS (SELECT doc_id, g // 64 AS f, g % 64 AS b,
                 round(CAST(SUM(code) AS DOUBLE) / COUNT(*), 6) AS px
          FROM ag GROUP BY 1, 2, 3),
abasis AS (SELECT u, b, round(cos(pi() * (2*b + 1) * u / 128.0), 12) AS w
           FROM generate_series(1, 16) g1(u)
           CROSS JOIN generate_series(0, 63) g2(b)),
aco AS (SELECT doc_id, f, u,
               CAST(SUM(CAST(round(px * w, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS coef
        FROM apool JOIN abasis USING (b) GROUP BY 1, 2, 3),
ah AS (SELECT doc_id,
              CAST(SUM(CASE WHEN coef > 0
                            THEN (CAST(1 AS BIGINT)
                                  << (CAST(f * 16 + u AS INT) - 1))
                            ELSE 0 END) AS BIGINT) AS afp
       FROM aco GROUP BY doc_id)"""


@query("multimodal_audio_fingerprint", oracle=f"""
WITH {_AFP_CTE.lstrip()}
SELECT doc_id, afp FROM ah
""")
def multimodal_audio_fingerprint(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Windowed spectral sign-bit fingerprint over the fake-PCM payload
    (operators.multimodal.audio_fingerprint — Haitsma-Kalker's audio
    fingerprint shape with band-energy differences simplified to DCT
    coefficient signs, windowing giving the time localization a global
    pHash lacks): 2 windows x 64 pooled bins x 16 coefficient signs =
    a 32-bit fingerprint whose every bit the oracle recomputes from
    the shared round(cos, 12) basis — exact cross-engine, like
    multimodal_phash."""
    docs = load(spark, sf_dir)["documents"]
    return M.audio_fingerprint(docs)


@query("multimodal_audio_pairs", oracle=f"""
WITH rep AS (SELECT CAST(2000000 + i AS BIGINT) AS doc_id,
                    (SELECT text FROM documents WHERE doc_id = 1) AS text
             FROM range(12) t(i)),
docs2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id, text FROM rep),
{_AFP_CTE.lstrip().replace("FROM documents", "FROM docs2")},
keep AS (SELECT afp FROM ah GROUP BY afp HAVING count(*) <= 10),
ah2 AS (SELECT ah.doc_id, ah.afp FROM ah JOIN keep USING (afp)),
bv AS (SELECT doc_id, afp, k,
              (afp >> (k * 8)) & 255 AS band_val
       FROM ah2 CROSS JOIN generate_series(0, 3) g(k)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.afp AS ha, b.afp AS hb
         FROM bv a JOIN bv b ON a.k = b.k AND a.band_val = b.band_val
                            AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
""")
def multimodal_audio_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs with the planted-group + group_cap
    proof (operators.multimodal.audio_pairs — phash_pairs' exact
    banded-hamming machinery, now shared via hamming_banded_pairs, on
    the windowed spectral fingerprint): 12 planted replicas of
    document 1 form a 13-member fingerprint group; group_cap=10
    excludes the mass-duplicate cluster from BOTH expansion paths and
    the oracle replays the exclusion exactly, so the output is proven
    to be precisely all pairs at hamming <= 3 among under-cap groups —
    the planted duplicates demonstrate detection, the cap demonstrates
    the quadratic-output guard, and banding keeps recall exact for
    hamming < bands without an all-pairs compare."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir)["documents"]
    seed = docs.filter(F.col("doc_id") == 1).select("text")
    rep = (spark.range(12)
           .select((F.col("id") + 2_000_000).alias("doc_id"))
           .crossJoin(F.broadcast(seed)))
    docs2 = docs.select("doc_id", "text").unionByName(rep)
    return M.audio_pairs(docs2, max_hamming=3, group_cap=10)
