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


def _model_weights():
    """The deterministic stand-in for a learned scoring head: 64 fixed
    weights derived from a Knuth-hash ramp, exactly representable the
    same way in Python and in SQL literals (k/1000 parses to the same
    IEEE double both ways)."""
    return [((i * 2654435761) % 1000 - 500) / 1000 for i in range(64)]


# ::double — DuckDB parses bare decimal literals as DECIMAL, which would
# route the products through decimal arithmetic instead of IEEE doubles
_W_VALUES = ", ".join(f"({i}, {w!r}::double)" for i, w in enumerate(_model_weights()))


@register(
    "mm_batch_inference",
    group="J",
    oracle=f"""
    with w(pos, wv) as (values {_W_VALUES}),
    pe as (
      select vec_id, generate_subscripts(embedding, 1) - 1 as pos,
             unnest(embedding) as v
      from embeddings
    ),
    s as (
      select vec_id, sum(cast(floor(v * wv * 1e9 + 0.5) as bigint)) as m
      from pe join w using (pos) group by 1
    )
    select vec_id,
           floor((cast(m as double) / 1e9) * 1e6 + 0.5) / 1e6 as score
    from s
    """,
)
def mm_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the batched-inference serving pattern — score every
    embedding with a model head inside an ITERATOR pandas UDF
    (Iterator[Series] → Iterator[Series]): the model loads ONCE per
    task, then streams Arrow batches through vectorized numpy — the
    shape used for real LLM/classifier scoring over a 100 TB corpus,
    where per-row (or even per-batch) model loading is the difference
    between feasible and not. No shuffle at all: scoring is a map-only
    stage; the scan and the Python stage pipeline per partition.

    The "model" here is a fixed linear head (deterministic weights), so
    the scores are exactly reproducible in SQL: per-term products are
    quantized to 1e-9 int64 before the (order-exact, < 2^53) row sum,
    and the final rounding uses the same floor(x·1e6+0.5) both sides —
    bit-identical across engines. Swapping in a torch module changes
    only ``_load`` and the batch expression.
    """
    import numpy as np
    import pandas as pd  # noqa: F811 (module-level import is the same object)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        w = np.array(_model_weights(), dtype=np.float64)  # load once per task
        for batch in it:
            arr = np.stack(batch.to_numpy()).astype(np.float64)
            terms = np.floor(arr * w * 1e9 + 0.5)
            m = terms.sum(axis=1)
            yield pd.Series(np.floor((m / 1e9) * 1e6 + 0.5) / 1e6)

    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", score("embedding").alias("score"))


@register("mm_embed_pca", group="J", oracle=None)
def mm_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: PCA over the embedding column via a distributed Gram
    matrix — the dimensionality/variance profile a pipeline computes
    before deciding how aggressively vectors can be compressed (cf.
    mm_embed_quantize / sim_topk_pq, which consume exactly this kind of
    analysis). Classic two-phase reduce: mapInPandas emits ONE partial
    per Arrow-batch — (n, Σx, upper-triangular ΣxxT) ≈ 2 k doubles — so
    the driver receives O(partitions·d²) bytes regardless of row count;
    at 100 TB the same pass works with the partials combined by a tiny
    final agg, never by moving vectors. The d×d covariance is then
    eigendecomposed on the driver (d = 64 → trivial), which is the
    standard split: data-sized work distributed, model-sized work
    local. Output: top-8 components with eigenvalue, cumulative
    explained-variance ratio, and the dominant input dimension of each
    component (sign-fixed so the loading is positive → deterministic
    across runs). Rows-only: eigendecomposition has no SQL twin."""
    import numpy as np

    d = 64
    emb = load(spark, sf_dir, "embeddings").select("embedding")
    iu = np.triu_indices(d)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if len(x) == 0:
                continue
            gram = x.T @ x
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [gram[iu].tolist()],
                }
            )

    rows = emb.mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    ).collect()
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    gram = np.zeros((d, d))
    # collect() preserves partition order → deterministic combine order
    for r in rows:
        s += np.asarray(r["s"])
        gram[iu] += np.asarray(r["g"])
    gram = gram + np.triu(gram, 1).T
    cov = gram / n - np.outer(s / n, s / n)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    total = float(evals.sum())
    out = []
    cum = 0.0
    for i in range(8):
        vec = evecs[:, i]
        top_dim = int(np.argmax(np.abs(vec)))
        loading = float(vec[top_dim])
        if loading < 0:
            loading = -loading  # sign-fixed: eigenvector sign is arbitrary
        cum += float(evals[i]) / total
        out.append(
            (
                i,
                round(float(evals[i]), 6),
                round(float(evals[i]) / total, 6),
                round(cum, 6),
                top_dim,
                round(loading, 6),
            )
        )
    return spark.createDataFrame(
        out,
        "component int, eigenvalue double, explained_ratio double,"
        " cum_explained double, top_dim int, top_loading double",
    )


@register("mm_image_resize_stub", group="J", oracle=None)
def mm_image_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over binary payloads via mapInPandas: each payload
    is 'decoded' (stub — _fake_decode), resized to fit a 224×224
    training square preserving aspect ratio, and re-emitted as a
    (smaller) binary thumbnail with the new dimensions as typed
    metadata. The resize ARITHMETIC (aspect-preserving fit, scale
    factor, output byte budget) and the Arrow batch plumbing are real;
    only pixel resampling is faked as byte truncation — swapping in
    PIL's Image.resize is a one-line change inside the iterator.
    Rows-only: binary output is engine-specific."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    target = 224

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = _fake_decode(payload)
                scale = min(target / w, target / h, 1.0)
                new_w, new_h = max(1, int(w * scale)), max(1, int(h * scale))
                # stub resample: proportional byte budget of the payload
                budget = max(1, int(len(payload) * (new_w * new_h) / (w * h)))
                rows.append(
                    (doc_id, w, h, new_w, new_h, round(scale, 6),
                     bytes(payload[:budget]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "src_w", "src_h", "out_w", "out_h",
                         "scale", "thumb"],
            )

    schema = (
        "doc_id bigint, src_w int, src_h int, out_w int, out_h int, "
        "scale double, thumb binary"
    )
    out = d.mapInPandas(resize_batches, schema)
    # rows-only self-checks: aspect ratio preserved, bounded output
    return out.select(
        "doc_id", "src_w", "src_h", "out_w", "out_h", "scale",
        F.octet_length("thumb").alias("thumb_bytes"),
    )


@register("mm_audio_frame_features", group="J", oracle=None)
def mm_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction plumbing: treat the payload as a mono
    PCM byte stream, window it into 25 ms frames with 10 ms hop
    (400/160 samples at 16 kHz — the standard ASR framing), and emit
    per-frame energy + zero-crossing-count computed on the stub
    'samples' (signed byte values). The framing arithmetic, row
    explosion (one row per frame) and Arrow batching are the real
    production shape; a real pipeline swaps the byte view for
    soundfile/librosa decoding. Frame count is capped at 8 per doc to
    bound output. Rows-only."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    win, hop, cap = 400, 160, 8

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = [b - 128 for b in payload]
                n_frames = max(0, 1 + (len(samples) - win) // hop)
                for i in range(min(n_frames, cap)):
                    fr = samples[i * hop : i * hop + win]
                    energy = sum(s * s for s in fr) / len(fr)
                    zc = sum(
                        1 for a, b in zip(fr, fr[1:]) if (a >= 0) != (b >= 0)
                    )
                    rows.append((doc_id, i, round(energy, 4), zc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "energy", "zero_crossings"]
            )

    schema = "doc_id bigint, frame_idx int, energy double, zero_crossings int"
    return d.mapInPandas(frame_batches, schema)
