"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference has no multimodal surface; this is the north-star extension for
training-data pipelines. The REAL parts here — schema, partitioning, UDF
signatures, Arrow batch shapes, metadata propagation — are what matters at
100 TB. The codec step itself is STUBBED (this container has no image/audio
libraries): ``decode_image`` raises ``NotImplementedError`` unless handed the
deterministic fake codec, whose behavior is pure arithmetic on the payload so
the whole pipeline stays oracle-checkable end-to-end.

Scale notes: every stage is a narrow ``mapInPandas`` over the scan — no
shuffle, no driver collect; binary payloads stream through Arrow record
batches. On a real cluster the only knob that matters is
``spark.sql.files.maxPartitionBytes`` (keep batches of big blobs within
executor memory) plus ``spark.sql.execution.arrow.maxRecordsPerBatch`` for
row-count control.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from localsql_spark.operators import spread

# Typed metadata carried alongside every blob. At scale this travels with the
# binary through every stage so downstream filters (fmt/width pushdown on the
# metadata parquet columns) never touch the payload bytes.
MEDIA_SCHEMA = ("doc_id long, media binary, "
                "meta struct<fmt:string, width:int, height:int, n_bytes:long>")

FEATURE_SCHEMA = ("doc_id long, n_bytes long, digest string, "
                  "fmt string, width int, height int, mean_byte double")

_FMTS = ("png", "jpeg", "webp")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media blob per document (payload = utf-8
    text bytes; metadata arithmetic on doc_id). Stands in for reading real
    image bytes from parquet/tar shards — schema and downstream plumbing are
    identical to the real thing."""
    fmt = F.element_at(F.array(*[F.lit(f) for f in _FMTS]),
                       (F.col("doc_id") % 3 + 1).cast("int"))
    payload = F.encode(F.col("text"), "UTF-8")
    return spread(docs).select(
        "doc_id",
        payload.alias("media"),
        F.struct(
            fmt.alias("fmt"),
            ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"))


def _pil_image():
    """Optional-dependency probe for Pillow (absent in this container; a
    real cluster image installs it).  Import-gated so every other path in
    this module works without it."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, fmt: str, *, codec: str = "real"):
    """Decode a blob to pixels (a ``bytes`` of 8-bit grayscale values).

    - ``codec='real'``: decode with Pillow when installed (grayscale
      convert, row-major bytes — the shape every downstream stat here
      consumes); raises ``NotImplementedError`` when no image library is
      present (this container), keeping the limitation explicit.
    - ``codec='fake'``: deterministic stand-in — "pixels" are the raw
      payload bytes; used by tests/oracles so the pipeline stays
      verifiable end-to-end without any codec.
    - ``codec='auto'``: real when Pillow is importable, fake otherwise —
      the deploy-everywhere default for feature jobs whose consumers
      tolerate the stand-in during local runs.
    """
    if codec == "fake":
        return payload
    if codec in ("real", "auto"):
        Image = _pil_image()
        if Image is not None:
            import io
            with Image.open(io.BytesIO(bytes(payload))) as im:
                return im.convert("L").tobytes()
        if codec == "auto":
            return payload
        raise NotImplementedError(
            "no image codec in this environment; run with codec='fake' or "
            "'auto', or install pillow/opencv on the cluster image")
    raise ValueError(f"unknown codec {codec!r}")


def extract_features(media: DataFrame, *, codec: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary media: byte length, md5
    digest, metadata passthrough, mean byte value (the fake codec's stand-in
    for an embedding/stat computed from decoded pixels).

    mapInPandas keeps this a narrow map over the scan — no shuffle; batch
    shape is (rows per Arrow batch) x (payload sizes), both bounded by the
    session's Arrow/file-split settings.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pixels = [decode_image(b, m["fmt"], codec=codec)
                      for b, m in zip(pdf["media"], pdf["meta"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in pdf["media"]],
                "digest": [hashlib.md5(b).hexdigest() for b in pdf["media"]],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "width": pd.array([m["width"] for m in pdf["meta"]],
                                  dtype="int32"),
                "height": pd.array([m["height"] for m in pdf["meta"]],
                                   dtype="int32"),
                "mean_byte": [(sum(px) / len(px)) if len(px) else None
                              for px in pixels],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, *, every: int = 4096,
                 frame_len: int = 16) -> DataFrame:
    """'Video' frame sampling stand-in: slice the payload every ``every``
    bytes into ``frame_len``-byte frames and emit one row per frame with its
    digest — the exact explode/batch shape a real frame sampler produces.
    Narrow map + explode; no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "offset": [], "frame_md5": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                for i, off in enumerate(range(0, len(blob), every)):
                    frame = blob[off:off + frame_len]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["offset"].append(off)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, schema="doc_id long, frame_no int, offset long, frame_md5 string")


def resize_media(media: DataFrame, *, factor: int = 2) -> DataFrame:
    """'Resize' stand-in: downsample the payload by taking every
    ``factor``-th byte and halve the metadata dimensions — the exact
    schema/batch shape of a real image resize (decode -> scale -> re-encode),
    with the codec stubbed to deterministic byte-stride sampling.
    Narrow Arrow-batched map; no shuffle."""
    stride = factor * factor  # 2D downsample ~ factor^2 fewer pixels

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            resized = [bytes(b[::stride]) for b in pdf["media"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "new_width": pd.array(
                    [m["width"] // factor for m in pdf["meta"]], dtype="int32"),
                "new_height": pd.array(
                    [m["height"] // factor for m in pdf["meta"]], dtype="int32"),
                "n_bytes": [len(r) for r in resized],
                "digest": [hashlib.md5(r).hexdigest() for r in resized],
            })

    return media.mapInPandas(
        run, schema="doc_id long, new_width int, new_height int, "
                    "n_bytes long, digest string")


def audio_energy(media: DataFrame, *, window: int = 1024) -> DataFrame:
    """'Audio' loudness analysis stand-in: decode the payload as unsigned
    8-bit PCM (fake codec — a real one swaps in soundfile/ffmpeg with the
    identical batch shape) and emit one row per ``window``-sample chunk with
    its RMS energy and peak.  This is the silence-trim / loudness-filter
    primitive of an audio training pipeline.  Narrow Arrow map + per-row
    explode; no shuffle.

    Determinism: samples are small ints, so the squared sum is exact in
    float64; one division + sqrt (correctly rounded by IEEE) + round(9)
    makes the RMS bit-identical on any engine.
    """

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "window_no": [], "n_samples": [],
                   "rms": [], "peak": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                a = np.frombuffer(bytes(blob), dtype=np.uint8)
                for i in range(0, max(len(a), 1), window):
                    seg = a[i:i + window].astype(np.float64)
                    if not len(seg):
                        continue
                    out["doc_id"].append(doc_id)
                    out["window_no"].append(i // window)
                    out["n_samples"].append(len(seg))
                    out["rms"].append(round(
                        float(np.sqrt((seg * seg).sum() / len(seg))), 9))
                    out["peak"].append(int(seg.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        schema="doc_id long, window_no int, n_samples long, "
               "rms double, peak int")


def dct_basis(spark, n_coef: int = 32, n_px: int = 64) -> DataFrame:
    """DCT-II basis (u, b, w) with weights rounded to 12 decimals —
    cross-engine deterministic: JVM Math.cos, DuckDB cos and Python
    math.cos all agree on every rounded value over this argument grid
    (probed exhaustively; pinned by test_phash_basis_matches_python), so
    both sides of the oracle can derive the basis independently instead
    of shipping 2048 literals."""
    return spark.sql(
        f"SELECT CAST(r1.id AS INT) AS u, CAST(r2.id AS INT) AS b, "
        f"round(cos(pi() * (2*r2.id + 1) * r1.id / {2 * n_px}.0), 12) AS w "
        f"FROM range(1, {n_coef + 1}) r1 CROSS JOIN range(0, {n_px}) r2")


def _halfup_fixed(vals, scale: int):
    """``round(v, scale) * 10^scale`` as exact int64 — the fixed-point image
    of Spark's ``Round(double, scale)`` (BigDecimal HALF_UP on the double's
    shortest repr), vectorized (optimization round 14).

    Fast path: ``floor(v*10^scale + 0.5)``.  It can only disagree with the
    repr-HALF_UP result when the scaled value sits within float error of a
    .5 tie, so elements inside a conservative tie band (4 ulps of the scaled
    value + 1e-9) are recomputed exactly with Decimal(repr(v)).  Error
    budget: |fl(v*10^s) - repr(v)*10^s| <= 0.5 ulp (the multiply) + 0.5 ulp
    (repr-vs-binary of v, same relative scale) — the 4-ulp band covers it
    with margin.  Exact ties (repr lands on .5 exactly) fall inside the
    band and take the Decimal path, which rounds HALF_UP like the JVM.
    Pinned bit-for-bit against the relational plan by
    test_fingerprint_arrow_matches_relational and the phash/audio oracles."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-scale)
    t = vals * float(10 ** scale)
    fl = np.floor(t)
    k = fl + np.floor((t - fl) + 0.5)  # floor(t + 0.5) without big-mag loss
    frac = t - fl
    band = 4.0 * np.spacing(np.abs(t)) + 1e-9
    risky = np.abs(frac - 0.5) <= band
    if risky.any():
        idx = np.nonzero(risky)
        vs = np.asarray(vals)[idx]
        k[idx] = [int(Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP)
                      .scaleb(scale)) for v in vs]
    return k.astype(np.int64)


def _np_dct_basis(n_coef: int, n_px: int):
    """The exact numpy image of :func:`dct_basis`: math.cos (== JVM
    Math.cos on this grid — pinned by test_phash_basis_matches_python)
    rounded by the same repr-HALF_UP-12 rule.  Returns (n_coef, n_px)
    float64 with W[u-1, b] = round(cos(pi*(2b+1)*u/(2*n_px)), 12)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    q = Decimal("1e-12")
    W = np.empty((n_coef, n_px), dtype=np.float64)
    for u in range(1, n_coef + 1):
        for b in range(n_px):
            c = math.cos(math.pi * (2 * b + 1) * u / (2.0 * n_px))
            W[u - 1, b] = float(Decimal(repr(c)).quantize(q, ROUND_HALF_UP))
    return W


def _fingerprint_arrow(docs: DataFrame, *, n_frames: int, n_coef: int,
                       n_px: int, out_col: str, doc_id_col: str,
                       text_col: str) -> DataFrame:
    """One Arrow-batched narrow map computing the pooled-DCT sign-bit
    fingerprint per document — bit-identical to the relational plan the
    oracles replay (optimization round 14, guide §4.2).

    The relational plan exploded every CHARACTER into a row (split +
    posexplode), shuffled |corpus chars| rows into the pooling aggregate,
    then joined the broadcast basis into a |docs| x n_px x n_coef-row
    aggregate (~10M rows at sf0.1, measured 2.7s of the 4.8s wall).  All
    of that is doc-local arithmetic, so it now runs as ONE mapInPandas
    over (doc_id, text) — zero shuffles, |docs| rows out; at 100 TB this
    removes two corpus-sized exchanges and the JVM->pooling shuffle
    entirely.  Exactness: pooling sums/counts are exact integers; the two
    Round(double) sites reproduce via :func:`_halfup_fixed`; the basis
    via :func:`_np_dct_basis`; the coefficient sum is the same exact
    int64 fixed-point sum the JVM fold used.  The relational builder is
    kept (``_fingerprint_relational``) and equivalence is pinned by
    test_fingerprint_arrow_matches_relational plus the unchanged
    phash/audio DuckDB oracles.

    Unicode note: characters are code points (utf-32), matching Spark's
    split('')+ascii() on every BMP string (and all fixture data)."""
    from typing import Iterator  # noqa: PLC0415

    nb = n_frames * n_px

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        W = _np_dct_basis(n_coef, n_px)  # once per task
        shifts = np.array([[(f * n_coef + u) for u in range(n_coef)]
                           for f in range(n_frames)], dtype=np.int64)
        for pdf in batches:
            ids, hashes = [], []
            for did, txt in zip(pdf[doc_id_col], pdf[text_col]):
                if not txt:
                    continue
                codes = np.frombuffer(txt.encode("utf-32-le"),
                                      dtype=np.uint32).astype(np.float64)
                L = len(codes)
                g = np.floor(np.arange(L, dtype=np.float64)
                             * float(nb) / float(L)).astype(np.int64)
                sums = np.bincount(g, weights=codes, minlength=nb)
                cnts = np.bincount(g, minlength=nb)
                hit = cnts > 0
                px = np.zeros(nb, dtype=np.float64)
                px[hit] = _halfup_fixed(sums[hit] / cnts[hit], 6) / 1e6
                h = 0
                for f in range(n_frames):
                    sl = slice(f * n_px, (f + 1) * n_px)
                    m = hit[sl]
                    if not m.any():
                        continue
                    prod = px[sl][m][None, :] * W[:, m]
                    coef = _halfup_fixed(prod, 12).sum(axis=1)
                    bits = np.where(coef > 0,
                                    np.int64(1) << shifts[f], np.int64(0))
                    h |= int(bits.sum())
                ids.append(did)
                hashes.append(h)
            yield pd.DataFrame({doc_id_col: ids, out_col: hashes})

    return (spread(docs.select(doc_id_col, text_col))
            .filter(F.length(F.col(text_col)) > 0)
            .mapInPandas(run, schema=f"{doc_id_col} long, {out_col} long"))


def phash_features(docs: DataFrame, *, n_coef: int = 32, n_px: int = 64,
                   doc_id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Perceptual hash over the fake-codec pixel stream: area-average the
    payload down to ``n_px`` pooled pixels (the pHash "resize" step —
    pooling, not stride sampling, is what makes the hash robust to local
    edits and length changes; measured: stride sampling left the corpus's
    nearest near-dup pair at hamming 14/32, pooling brings it to 2/32),
    project onto the first ``n_coef`` LOW-frequency AC coefficients of
    the 1-D DCT-II (high coefficients are noise-dominated and flip
    freely — the classic pHash energy-compaction argument), hash bit
    u = (coefficient > 0).  The decode step stands on the deterministic
    fake codec (pixel value = code point of the payload character), so
    the whole hash is exact-oracle-able.

    Entirely JVM-side: one split+posexplode per doc (O(L) rows, the char
    array is generated once — no per-row substring seek), a pooling
    aggregate, a broadcast join against the (n_coef x n_px)-row basis,
    and one map-side-combined aggregate — row-local work throughout,
    doc-key shuffles only.  A real pipeline swaps the pixel source for
    decoded grayscale bytes (decode_image codec='real'); everything from
    the pooler down is unchanged.

    Output: ``(doc_id, phash)`` with phash the n_coef-bit BIGINT.

    Since optimization round 14 the computation runs as one Arrow-batched
    narrow map (:func:`_fingerprint_arrow` — bit-identical, zero shuffles,
    no corpus-chars-sized rows); this relational body is kept as
    ``phash_features_relational``, the oracle-shaped reference the
    equivalence test compares against.
    """
    return _fingerprint_arrow(docs, n_frames=1, n_coef=n_coef, n_px=n_px,
                              out_col="phash", doc_id_col=doc_id_col,
                              text_col=text_col)


def phash_features_relational(docs: DataFrame, *, n_coef: int = 32,
                              n_px: int = 64, doc_id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """The original JVM-relational phash plan (see :func:`phash_features`
    docstring) — the oracle-shaped reference implementation."""
    spark = docs.sparkSession
    ch = (spread(docs).filter(F.length(F.col(text_col)) > 0)
          .select(doc_id_col, F.split(F.col(text_col), "").alias("chars"))
          .select(doc_id_col, F.size("chars").alias("L"),
                  F.posexplode("chars").alias("i0", "c")))
    pool = (ch.select(doc_id_col,
                      F.floor(F.col("i0") * float(n_px) / F.col("L"))
                      .cast("int").alias("b"),
                      F.ascii("c").alias("code"))
            .groupBy(doc_id_col, "b")
            .agg(F.round(F.sum("code").cast("double")
                         / F.count(F.lit(1)), 6).alias("px")))
    # exact fixed-point sum on the PRIMITIVE long path: each rounded
    # product round(px*w, 12) is an exact multiple k * 1e-12 with
    # |k| <= 2.6e14, and k recovers exactly from the double (the
    # round-trip error k*1e-16*1e12 + one mult ulp is < 0.05 << 0.5), so
    # SUM(k) over longs == the decimal(38,12) sum to the last digit —
    # same signs, same hash — but runs in whole-stage codegen instead of
    # the ObjectHashAggregate decimal path (measured 5.3s -> ~2s warm on
    # the 10M-row coefficient aggregate at sf0.1)
    co = (pool.join(F.broadcast(dct_basis(spark, n_coef, n_px)), "b")
          .groupBy(doc_id_col, "u")
          .agg(F.sum(F.round(F.round(F.col("px") * F.col("w"), 12)
                             * F.lit(1e12)).cast("bigint"))
               .alias("coef_fp")))
    return (co.groupBy(doc_id_col)
            .agg(F.sum(F.when(F.col("coef_fp") > 0,
                              F.expr("shiftleft(cast(1 as bigint), u - 1)"))
                       .otherwise(F.lit(0).cast("bigint")))
                 .alias("phash")))


def phash_pairs(docs: DataFrame, *, max_hamming: int = 3, bands: int = 4,
                n_coef: int = 32, n_px: int = 64,
                group_cap: int | None = None,
                doc_id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Multimodal near-dup candidate pairs by banded hamming on the
    perceptual hash — the SimHash/LSH discipline from operators.dedup
    applied to media: split the n_coef-bit pHash into ``bands`` bands; a
    pair whose hashes agree on ANY full band becomes a candidate (a pair
    within hamming distance d < bands must agree on >= 1 band, so recall
    is exact for d <= bands-1 and the all-pairs compare is avoided);
    candidates are verified by exact bit_count(xor) <= ``max_hamming``.

    Scale design: the band join runs over DISTINCT hash values, not
    documents.  Perceptual hashes collapse near-dup groups onto few
    values by construction (that is their job), so a doc-level band
    self-join is quadratic in duplicate-group size — measured 29.3M
    doc-level candidates vs 483k distinct-hash candidates (60x) on the
    16x scale fixture.  Verifying hamming on distinct-hash pairs first
    and only then expanding each surviving (ha, hb) to its doc groups
    (plus the group-local same-hash pairs at hamming 0) makes the
    candidate stage quadratic in distinct hashes per bucket — bounded by
    corpus structure, not corpus size — and the expansion stage
    output-bounded.  Output is identical: for max_hamming < bands the
    pigeonhole guarantee makes banding a pure candidate filter, so the
    result is exactly every pair at hamming <= max_hamming either way.

    ``group_cap`` bounds the OUTPUT the way minhash's bucket_cap bounds
    its candidates: pair cardinality is quadratic in hash-group size by
    definition (the 64x scale probe emitted 4.5e9 REAL pairs at flat
    wall-per-pair — the curve is the answer's size, not the algorithm),
    so a mass-duplicate corpus makes the pair LIST itself the cost.
    Hash groups larger than the cap are excluded from pair expansion on
    BOTH the cross-group and same-hash paths — at pHash granularity an
    over-cap group is an exact/near-exact duplicate CLUSTER, which the
    group listing (groupBy phash) already names in |group| rows; feed
    those to exact_dedup-style keep-one instead of enumerating
    |group|² pairs.  Default None preserves the exact full-pair
    semantics the oracle checks.

    Output: ``(doc_a, doc_b, hamming)`` with doc_a < doc_b.
    """
    h = phash_features(docs, n_coef=n_coef, n_px=n_px,
                       doc_id_col=doc_id_col, text_col=text_col)
    return hamming_banded_pairs(h, hash_col="phash", n_bits=n_coef,
                                bands=bands, max_hamming=max_hamming,
                                group_cap=group_cap,
                                doc_id_col=doc_id_col)


def hamming_banded_pairs(h: DataFrame, *, hash_col: str, n_bits: int,
                         bands: int, max_hamming: int,
                         group_cap: int | None = None,
                         doc_id_col: str = "doc_id") -> DataFrame:
    """The distinct-hash banded-hamming pair machinery shared by every
    fingerprint family (pHash over pixels, the audio spectral
    fingerprint — one implementation so the band split, the over-cap
    exclusion, and the two expansion paths can never drift between
    modalities).  See :func:`phash_pairs` for the scale design (band
    join over DISTINCT hash values; group_cap bounds the quadratic
    output).  ``h`` is (doc_id_col, hash_col); returns
    (doc_a, doc_b, hamming)."""
    from localsql_spark.operators import track_persist

    assert max_hamming < bands, "banding only guarantees recall for " \
                                "hamming < bands"
    width = n_bits // bands
    h = track_persist(h)
    hv = track_persist(h.groupBy(hash_col)
                       .agg(F.count(F.lit(1)).alias("grp_n")))
    if group_cap is not None:
        capped = hv.filter(F.col("grp_n") <= group_cap)
        h = h.join(capped.select(hash_col), hash_col, "semi")
        hv = capped
    bandvals = hv.select(
        hash_col,
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("k"),
                     F.shiftrightunsigned(hash_col, k * width)
                     .bitwiseAND((1 << width) - 1).alias("bv"))
            for k in range(bands)])).alias("kb")) \
        .select(hash_col, "kb.k", "kb.bv")
    a = bandvals.select(F.col(hash_col).alias("ha"), "k", "bv")
    b = bandvals.select(F.col(hash_col).alias("hb"), "k", "bv")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    hpairs = (a.join(b, ["k", "bv"])
              .filter(F.col("ha") < F.col("hb"))
              .select("ha", "hb")
              .distinct()
              .select("ha", "hb", ham.cast("int").alias("hamming"))
              .filter(F.col("hamming") <= max_hamming))
    # cross-group expansion: each surviving hash pair fans out to its two
    # doc groups — work proportional to the emitted pairs, nothing more
    cross = (hpairs
             .join(h.select(F.col(doc_id_col).alias("ida"),
                            F.col(hash_col).alias("ha")), "ha")
             .join(h.select(F.col(doc_id_col).alias("idb"),
                            F.col(hash_col).alias("hb")), "hb")
             .select(F.least("ida", "idb").alias("doc_a"),
                     F.greatest("ida", "idb").alias("doc_b"), "hamming"))
    # same-hash groups pair group-locally at hamming 0 (no band join)
    same_h = h.join(hv.filter(F.col("grp_n") > 1), hash_col)
    same = (same_h.select(hash_col, F.col(doc_id_col).alias("doc_a"))
            .join(same_h.select(hash_col,
                                F.col(doc_id_col).alias("doc_b")),
                  hash_col)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", F.lit(0).alias("hamming")))
    return cross.unionByName(same)


def audio_fingerprint(docs: DataFrame, *, n_frames: int = 2,
                      n_coef: int = 16, n_px: int = 64,
                      doc_id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Spectral sign-bit fingerprint over WINDOWED frames of the
    fake-PCM stream — the audio near-dup primitive completing the
    multimodal family next to :func:`phash_features` (which hashes the
    whole payload as one image): the signal splits into ``n_frames``
    equal time windows, each window pools to ``n_px`` bins (the same
    area-average robustness argument as pHash), projects onto the
    first ``n_coef`` low-frequency DCT-II coefficients — the shared
    cross-engine-pinned :func:`dct_basis` — and contributes one sign
    bit per coefficient.  This is Haitsma-Kalker's audio-fingerprint
    shape ("A Highly Robust Audio Fingerprinting System", ISMIR 2002 —
    public: sub-fingerprints = energy-sign bits over windowed spectral
    bands) with the band-energy differences simplified to DCT
    coefficient signs, which keeps every bit exactly SQL-replayable.
    Time localization is what distinguishes it from the global pHash:
    swapping two halves of a track flips frame-local bits the global
    pool would average away.

    Output ``(doc_id, afp)``: an ``n_frames * n_coef``-bit BIGINT, bit
    (f*n_coef + u - 1) = sign of frame f's coefficient u.

    Since optimization round 14 the computation runs as one Arrow-batched
    narrow map (:func:`_fingerprint_arrow` — bit-identical, zero shuffles);
    the relational body is kept as ``audio_fingerprint_relational`` for
    the equivalence test."""
    return _fingerprint_arrow(docs, n_frames=n_frames, n_coef=n_coef,
                              n_px=n_px, out_col="afp",
                              doc_id_col=doc_id_col, text_col=text_col)


def audio_fingerprint_relational(docs: DataFrame, *, n_frames: int = 2,
                                 n_coef: int = 16, n_px: int = 64,
                                 doc_id_col: str = "doc_id",
                                 text_col: str = "text") -> DataFrame:
    """The original JVM-relational audio-fingerprint plan (see
    :func:`audio_fingerprint`) — the oracle-shaped reference."""
    spark = docs.sparkSession
    nb = n_frames * n_px
    ch = (spread(docs).filter(F.length(F.col(text_col)) > 0)
          .select(doc_id_col, F.split(F.col(text_col), "").alias("chars"))
          .select(doc_id_col, F.size("chars").alias("L"),
                  F.posexplode("chars").alias("i0", "c")))
    pool = (ch.select(doc_id_col,
                      F.floor(F.col("i0") * float(nb) / F.col("L"))
                      .cast("int").alias("g"),
                      F.ascii("c").alias("code"))
            .select(doc_id_col,
                    F.floor(F.col("g") / n_px).cast("int").alias("f"),
                    (F.col("g") % n_px).alias("b"), "code")
            .groupBy(doc_id_col, "f", "b")
            .agg(F.round(F.sum("code").cast("double")
                         / F.count(F.lit(1)), 6).alias("px")))
    # same exact fixed-point long path as phash_features (see the bound
    # argument there)
    co = (pool.join(F.broadcast(dct_basis(spark, n_coef, n_px)), "b")
          .groupBy(doc_id_col, "f", "u")
          .agg(F.sum(F.round(F.round(F.col("px") * F.col("w"), 12)
                             * F.lit(1e12)).cast("bigint"))
               .alias("coef_fp")))
    return (co.groupBy(doc_id_col)
            .agg(F.sum(F.when(
                F.col("coef_fp") > 0,
                F.expr(f"shiftleft(cast(1 as bigint), "
                       f"f * {n_coef} + u - 1)"))
                .otherwise(F.lit(0).cast("bigint")))
                 .alias("afp")))


def audio_pairs(docs: DataFrame, *, max_hamming: int = 3, bands: int = 4,
                n_frames: int = 2, n_coef: int = 16, n_px: int = 64,
                group_cap: int | None = None,
                doc_id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Audio near-duplicate pairs: banded hamming over the windowed
    spectral fingerprint — :func:`phash_pairs`' exact machinery
    (:func:`hamming_banded_pairs`) on :func:`audio_fingerprint`, so the
    recall guarantee (exact for hamming < bands), the distinct-hash
    candidate bound, and the group_cap output bound all carry over
    unchanged.  Output (doc_a, doc_b, hamming)."""
    h = audio_fingerprint(docs, n_frames=n_frames, n_coef=n_coef,
                          n_px=n_px, doc_id_col=doc_id_col,
                          text_col=text_col)
    return hamming_banded_pairs(h, hash_col="afp",
                                n_bits=n_frames * n_coef, bands=bands,
                                max_hamming=max_hamming,
                                group_cap=group_cap,
                                doc_id_col=doc_id_col)
