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
