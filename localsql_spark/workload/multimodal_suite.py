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
