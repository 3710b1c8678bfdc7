"""Group J (multimodal) — opaque binary media columns with typed
metadata, processed through Arrow-batched Python (SURVEY.md §2 "mm_*";
task brief: "treat image/audio/video as opaque binary columns").

The decode step is STUBBED: no image/audio libraries exist in this
container, so ``_fake_decode`` derives deterministic pseudo-metadata
from the bytes themselves (documented below) — while everything
Spark-side is real and load-bearing: the binary column construction,
the mapInPandas schema contract, Arrow batch iteration, and the
explode-shaped frame-sampling output. Swapping ``_fake_decode`` for
PIL/ffmpeg is a one-function change.

Scale: mapInPandas streams Arrow batches — peak memory is one batch,
not one partition; binary payloads never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import register


@register(
    "mm_binary_metadata",
    group="J",
    oracle="""
    select doc_id,
           octet_length(encode(text)) as n_bytes,
           lang as media_kind
    from documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingest shape: payload as an opaque binary column +
    typed metadata columns beside it. The fixture text stands in for
    media bytes (utf-8 encode); byte length is the oracle-checkable
    invariant."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        F.col("lang").alias("media_kind"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB for a real media decoder (no PIL/ffmpeg in this container).
    Deterministic pseudo-metadata: width/height from the first bytes,
    'mean luminance' = mean byte value. Replace with a real decoder to
    productionize; the Spark plumbing around it does not change."""
    w = 64 + (payload[0] if payload else 0) % 192
    h = 64 + (payload[1] if len(payload) > 1 else 0) % 192
    mean = (sum(payload[:256]) / min(len(payload), 256)) if payload else 0.0
    return w, h, round(mean, 4)


@register("mm_decode_stub", group="J", oracle=None)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas —
    Arrow batch iterator in, typed feature rows out (rows-only: the
    decode itself is the stub above, but schema/batching are real)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "mean_luma": meta.map(lambda m: m[2]),
                }
            )

    return d.mapInPandas(
        decode_batches,
        schema="doc_id long, width int, height int, mean_luma double",
    ).orderBy("doc_id")


@register("mm_frame_sample", group="J", oracle=None)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling shape: one binary 'video' → N sampled 'frames'
    (row-expanding mapInPandas). Frames here are 256-byte chunks at a
    stride of 4 chunks; a real implementation swaps the chunker for a
    container demuxer. Output partitioning follows the input — no
    shuffle until someone groups the frames."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    chunk, stride = 256, 4

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_chunks = max(1, len(payload) // chunk)
                for i in range(0, n_chunks, stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(payload[i * chunk : (i + 1) * chunk])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_bytes binary"
    )
