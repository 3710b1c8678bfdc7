"""Group I — Structured Streaming over the events table (SURVEY.md §2.I).

Batch/stream parity rule (SURVEY §2.I): every streaming operator is
built by ONE plan-builder function applied to either a batch or a
streaming DataFrame — the registered query runs the batch twin (DuckDB-
checkable), and tests/test_streaming.py runs the identical builder over
``readStream`` into a memory sink and asserts equality with the twin.
That makes the oracle meaningful for streaming semantics, not just for
a parallel batch reimplementation.

Scale notes: all aggregations are keyed by (window, type) or session —
state per key, bounded by the watermark (late state evicted); at 100 TB
/day the state store moves to RocksDB and the source to Kafka, but the
plan shapes below are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalakecrawler_spark.io import load, normalize_events_ts, table_path
from datalakecrawler_spark.registry import SUM_D, dsum, register

def events_source_schema(spark: SparkSession, path: str) -> T.StructType:
    """The on-disk schema of an events parquet path, probed from the
    file footer via a throwaway batch read. Streaming sources require
    an explicit schema, and the fixtures have shipped ``ts`` as both
    TIMESTAMP(NANOS) (→ bigint under the nanos-as-long flag) and
    TIMESTAMP(MICROS) across generations — probing instead of
    hardcoding keeps the stream readable under either layout."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of io.load(..., 'events'): parquet source with an
    explicit footer-probed schema, ts normalized to TimestampType."""
    path = sf_dir.rstrip("/")
    schema = events_source_schema(spark, f"{path}/events.parquet")
    # the file-stream source needs a directory: point at sf_dir and
    # glob-filter to the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(path)
    )
    return normalize_events_ts(raw)


# ---------------------------------------------------------------------------
# Plan builders — applied identically to batch and streaming frames
# ---------------------------------------------------------------------------


def build_tumbling_count(events: DataFrame) -> DataFrame:
    """I1: 1-hour tumbling window, count + sum(value) per event_type."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"), "event_type", "cnt", "sum_value"
        )
    )


def build_sliding_avg(events: DataFrame) -> DataFrame:
    """I2: 1-hour window sliding every 15 minutes, avg(value)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,10)")).cast("double")
                / F.count("value"),
                6,
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "cnt", "avg_value")
    )


def build_session_window(events: DataFrame) -> DataFrame:
    """I3: per-user session windows, 30-minute inactivity gap."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def build_dedup(events: DataFrame) -> DataFrame:
    """I4: first event per (user_id, event_type) by event_id — the
    deterministic formulation of streaming dropDuplicates (batch
    dropDuplicates keeps an arbitrary row; min_by keeps the first
    *arrival*, which is what the stream's state does)."""
    return events.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


def build_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """I5: enrich events with a static customer dim via the documented
    user_id = c_custkey % 150 mapping (FIXTURES.md); the dim is reduced
    to one deterministic representative per mapped key first."""
    dim = (
        customer.groupBy((F.col("c_custkey") % 150).alias("user_id"))
        .agg(
            F.min("c_custkey").alias("rep_custkey"),
            F.min_by("c_mktsegment", "c_custkey").alias("segment"),
        )
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    )


def build_late_flags(events: DataFrame) -> DataFrame:
    """I6 (batch analytic form): mark events that a 10-minute watermark
    would drop — ts older than the running max event-time over arrival
    order (event_id IS arrival order per FIXTURES.md)."""
    from datalakecrawler_spark.distrank import with_global_cummax

    # distributed running max over arrival order — the event log is
    # THE fact table; a global window would single-task the replay
    flagged = with_global_cummax(events, ["event_id"], "ts", out="__hi")
    return (
        flagged.withColumn(
            "late",
            (
                F.col("ts") < F.col("__hi") - F.expr("interval 10 minutes")
            ).cast("int"),
        )
        .groupBy("late")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def build_chained_window_agg(events: DataFrame) -> DataFrame:
    """I-ext: CHAINED windowed aggregation — a 10-minute tumbling
    count per event_type re-aggregated into 1-hour totals in the same
    plan: ``window(window_col, '1 hour')`` over the first window's
    struct column (two stateful operators in one streaming query,
    Spark 3.5+). The pre-aggregation is the scale move: the hourly
    state only ever sees 6 rows per (hour, type), not raw events —
    the same partial-agg principle as map-side combine, applied to
    stream state."""
    ten = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w10"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt10"))
    )
    return (
        ten.groupBy(F.window("w10", "1 hour").alias("w60"), "event_type")
        .agg(
            F.sum("cnt10").alias("cnt"),
            F.count(F.lit(1)).alias("n_subwindows"),
        )
        .select(
            F.col("w60.start").alias("w_start"),
            "event_type",
            "cnt",
            "n_subwindows",
        )
    )


# ---------------------------------------------------------------------------
# Registered batch twins (the oracle-checkable surface)
# ---------------------------------------------------------------------------


@register(
    "stream_tumbling_count",
    group="I",
    oracle=f"""
    select cast(date_trunc('hour', ts) as timestamp) as w_start, event_type,
           count(*) as cnt, {SUM_D.format('value')} as sum_value
    from events group by 1, 2
    """,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 batch twin (stream equality asserted in test_streaming)."""
    return build_tumbling_count(load(spark, sf_dir, "events"))


@register(
    "stream_sliding_avg",
    group="I",
    oracle="""
    select to_timestamp(cast(floor(epoch(ts) / 900) * 900 - k * 900 as bigint))
               ::timestamp as w_start,
           count(*) as cnt,
           round(cast(sum(cast(value as decimal(38,10))) as double)
                 / count(value), 6) as avg_value
    from events cross join unnest(range(4)) as t(k)
    group by 1
    """,
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 batch twin — the oracle expands each event into its 4
    overlapping windows (1h length / 15m slide)."""
    return build_sliding_avg(load(spark, sf_dir, "events"))


@register(
    "stream_session_window",
    group="I",
    oracle="""
    with ordered as (
        select user_id, ts,
               lag(ts) over (partition by user_id order by ts, event_id) as prev_ts
        from events
    ),
    marked as (
        select user_id, ts,
               case when prev_ts is null
                         or ts - prev_ts > interval 30 minutes
                    then 1 else 0 end as new_session
        from ordered
    ),
    sessions as (
        select user_id, ts,
               sum(new_session) over (partition by user_id order by ts
                   rows between unbounded preceding and current row) as sid
        from marked
    )
    select min(ts) as session_start, user_id, count(*) as n_events
    from sessions group by user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 batch twin — oracle is the classic gaps-and-islands
    formulation of session_window semantics."""
    return build_session_window(load(spark, sf_dir, "events"))


@register(
    "stream_dedup_watermark",
    group="I",
    oracle="""
    select user_id, event_type, min(event_id) as first_event_id
    from events group by 1, 2
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4 batch twin of streaming dropDuplicates state semantics."""
    return build_dedup(load(spark, sf_dir, "events"))


@register(
    "stream_static_join",
    group="I",
    oracle=f"""
    with dim as (
        select c_custkey % 150 as user_id,
               min(c_custkey) as rep_custkey,
               arg_min(c_mktsegment, c_custkey) as segment
        from customer group by 1
    )
    select segment, count(*) as n_events, {SUM_D.format('value')} as total_value
    from events join dim using (user_id)
    group by segment
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 batch twin: stream-static broadcast enrich + aggregate."""
    return build_static_join(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    )


@register(
    "stream_late_data",
    group="I",
    oracle="""
    with flagged as (
        select case when ts < max(ts) over (order by event_id
                        rows between unbounded preceding and current row)
                        - interval 10 minutes
                    then 1 else 0 end as late
        from events
    )
    select late, count(*) as n_events from flagged group by late
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 batch analytic twin: how many events a 10-minute watermark
    would drop (the actual drop behavior is exercised in
    test_streaming with a two-batch staged source)."""
    return build_late_flags(load(spark, sf_dir, "events"))


def build_stream_stream_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """I-ext: stream-stream interval join — purchases attributed to the
    click by the same user within the preceding hour. Both sides carry
    watermarks (required for state cleanup in append mode); the time-
    range predicate bounds the join state to ~1 hour of events per side.
    At 100 TB/day both streams are Kafka-partitioned by user_id, so the
    shuffle is a co-partitioned state exchange, not a full repartition."""

    def side(df: DataFrame, etype: str, prefix: str) -> DataFrame:
        out = df.where(F.col("event_type") == etype).select(
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts").alias(f"{prefix}_ts"),
        )
        if out.isStreaming:
            out = out.withWatermark(f"{prefix}_ts", "10 minutes")
        return out

    clicks, buys = side(left, "click", "click"), side(right, "purchase", "buy")
    return clicks.join(
        buys,
        (F.col("click_user") == F.col("buy_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("interval 1 hour")),
    ).select(
        "click_id", F.col("buy_id").alias("purchase_id"),
        F.col("click_user").alias("user_id"),
    )


@register(
    "stream_stream_join",
    group="I",
    oracle="""
    select l.event_id as click_id, r.event_id as purchase_id, l.user_id
    from events l join events r
      on l.user_id = r.user_id
     and l.event_type = 'click' and r.event_type = 'purchase'
     and r.ts >= l.ts and r.ts <= l.ts + interval 1 hour
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin of the stream-stream interval join (stream
    equality asserted in test_streaming)."""
    e = load(spark, sf_dir, "events")
    return build_stream_stream_join(e, e)


def build_user_stats_stateful(events: DataFrame) -> DataFrame:
    """I-ext: custom stateful operator via applyInPandasWithState —
    per-user running (event count, max value). This is the extension
    point for stateful logic Spark's built-ins can't express (custom
    sessionization, CEP, online features). State is one (long, double)
    pair per user — bounded; at production scale back it with RocksDB.
    Only valid on streaming DataFrames (tests drive it; the registered
    batch twin below is the oracle surface)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs, state: GroupState):
        cnt, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            cnt += len(pdf)
            mx = max(mx, float(pdf["value"].max()))
        state.update((cnt, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "max_value": [mx]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="cnt long, mx double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


@register(
    "stream_stateful_user_stats",
    group="I",
    oracle="""
    select user_id, count(*) as n_events, max(value) as max_value
    from events group by user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState custom stateful operator
    (stream equality asserted in test_streaming)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value")
    )


def build_user_value_partials(events: DataFrame) -> DataFrame:
    """Mergeable per-user partials: count + micro-unit value sum.
    Partials from separate micro-batches re-aggregate exactly (counts
    add; int64 micro-sums are associative), which is what makes the
    foreachBatch sink's merge-on-read exact."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1e6 + 0.5)).alias("micro"),
    )


def finalize_user_value_totals(partials: DataFrame) -> DataFrame:
    """Merge partials → final per-user totals (double, policy-rounded)."""
    return partials.groupBy("user_id").agg(
        F.sum("n_events").alias("n_events"),
        (F.sum("micro").cast("double") / 1e6).alias("total_value"),
    )


def run_foreachbatch_upsert(
    spark: SparkSession, src_dir: str, sink_dir: str
) -> None:
    """Streaming half of stream_foreachbatch_upsert: each micro-batch's
    partials land at ``{sink_dir}/epoch=<id>`` with mode=overwrite, so a
    retried epoch REPLACES its own output instead of double-counting —
    the standard idempotent (effectively exactly-once) foreachBatch
    recipe. Readers merge partials across epochs at query time."""
    raw = normalize_events_ts(
        spark.readStream.schema(events_source_schema(spark, src_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        build_user_value_partials(batch_df).write.mode("overwrite").parquet(
            f"{sink_dir}/epoch={epoch_id}"
        )

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{sink_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


@register(
    "stream_foreachbatch_upsert",
    group="I",
    oracle=f"""
    select user_id, count(*) as n_events, {SUM_D.format("value")} as total_value
    from events group by 1
    """,
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin: per-user event totals. The streaming half
    (run_foreachbatch_upsert) writes per-epoch partial parquet with
    overwrite-by-epoch idempotence; tests/test_streaming.py drives a
    4-file source through it, REPLAYS an epoch to prove a retry cannot
    double-count, and asserts the merged sink equals this twin."""
    return finalize_user_value_totals(
        build_user_value_partials(load(spark, sf_dir, "events"))
    )


@register(
    "stream_chained_window_agg",
    group="I",
    oracle="""
    with t10 as (
      select to_timestamp(cast(floor(epoch(ts) / 600) * 600 as bigint))::timestamp as w10,
             event_type, count(*) as cnt10
      from events group by 1, 2
    )
    select to_timestamp(cast(floor(epoch(w10) / 3600) * 3600 as bigint))::timestamp as w_start,
           event_type, cast(sum(cnt10) as bigint) as cnt,
           count(*) as n_subwindows
    from t10 group by 1, 2
    """,
)
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin of the chained two-level window aggregation
    (stream equality asserted in test_streaming)."""
    return build_chained_window_agg(load(spark, sf_dir, "events"))


def build_user_totals_tws(events: DataFrame) -> DataFrame:
    """I-ext: Spark 4 transformWithStateInPandas — the successor API to
    applyInPandasWithState: an object-oriented StatefulProcessor with
    typed, composable state handles (ValueState here; ListState/
    MapState/timers available), schema evolution, and a RocksDB-backed
    store requirement. Keeps per-user running (count, int64 micro-unit
    value total) — exact-merge state, the same policy as the batch
    engine, so restarts and re-partitioning never drift the totals.
    Only valid on streaming DataFrames (tests drive it; the registered
    batch twin below is the oracle surface). Runtime dependency gate:
    the API ships state through protobuf in the Python workers, so the
    streaming test skips when google.protobuf is unavailable (as in
    this container) — the builder itself stays importable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("tot", "cnt long, micro long")

        def handleInputRows(self, key, rows, timerValues):
            cnt, micro = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
            for pdf in rows:
                cnt += len(pdf)
                micro += int(
                    np.floor(pdf["value"].to_numpy(dtype="float64") * 1e6 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._state.update((cnt, micro))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_value": [micro / 1e6],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


@register(
    "stream_tws_running_totals",
    group="I",
    oracle=f"""
    select user_id, count(*) as n_events,
           {SUM_D.format('value')} as total_value
    from events group by user_id
    """,
)
def stream_tws_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the transformWithStateInPandas stateful processor
    (stream equality asserted in test_streaming)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value")
    )


@register(
    "stream_python_source_replay",
    group="I",
    oracle="""
    select event_type, count(*) as cnt
    from events group by event_type
    """,
)
def stream_python_source_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin of the `eventreplay` streaming Python Data
    Source (sources/connectors.py): the source replays the events
    parquet through Structured Streaming in row-range offsets —
    2500-row batches, 4 executor slices per batch, offsets persisted
    in the checkpoint log so restart resumes exactly-once. The
    streaming half aggregates per-type counts in complete mode and is
    asserted equal to this batch aggregation in test_streaming. The
    replay shape is the canonical backfill path: reprocess cold
    history through the SAME streaming query that serves live data,
    so one plan definition covers both regimes."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


_DRIFT_SPLIT = "2024-01-11"  # baseline = first 10 days of the fixture month


def baseline_value_hist(events_batch: DataFrame) -> DataFrame:
    """Static baseline histogram for drift monitoring: value binned to
    ten fixed-width 50-unit bins over the pre-split period, with each
    bin's probability mass. Exact integer counts → identical doubles
    in every engine. This is the crawl artifact a monitor loads; the
    stream never re-reads baseline data."""
    binc = F.least(F.lit(9), F.floor(F.col("value") / 50)).cast("int")
    hist = (
        events_batch.where(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"))
        .groupBy(binc.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = hist.agg(F.sum("c").alias("t"))
    return (
        hist.crossJoin(F.broadcast(t))
        .select("bin", (F.col("c").cast("double") / F.col("t")).alias("p_base"))
    )


def build_drift_psi(events: DataFrame, baseline_hist: DataFrame) -> DataFrame:
    """I-ext builder: per-day PSI of the event value distribution
    against a static baseline histogram — continuous drift monitoring
    as a streaming query. PSI is not a plain sum (each term needs the
    window's TOTAL count), so the windowed form uses the algebraic
    decomposition

        PSI = (A − B)/T − (Tv/T)·lnT − D + C·lnT + E

    with A = Σc·ln c, B = Σc·ln q, C = Σq, D = Σq·ln c, E = Σq·ln q
    over bins valid on both sides, T = all events in the window, Tv =
    events in valid bins — every component a plain SUM, so the whole
    thing runs as two chained stateful aggregations (bin counts per
    day window, then the component sums per day) with bounded state:
    ≤ 10 bin rows per window at level 1, one row per window at level
    2. The static side is a broadcast stream-static join — stateless.
    Late events update their window's PSI until the watermark closes
    it. Deployment note: Spark's multi-stateful-operator correctness
    check conservatively flags any join sandwiched between stateful
    aggs; the stream-static join here is stateless (delays no rows,
    emits nothing late), so running this plan requires
    spark.sql.streaming.statefulOperator.checkCorrectness.enabled=
    false — sound for this shape, asserted equal to the batch twin in
    tests/test_streaming.py."""
    binc = F.least(F.lit(9), F.floor(F.col("value") / 50)).cast("int")
    cur = (
        events.where(F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), binc.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    j = cur.join(F.broadcast(baseline_hist), "bin", "left")
    c = F.col("cnt").cast("double")
    q = F.col("p_base")
    valid = q.isNotNull() & (q > 0)
    z = F.lit(0.0)
    comp = j.groupBy(F.window("w", "1 day").alias("w2")).agg(
        F.sum("cnt").alias("t_all"),
        F.sum(F.when(valid, F.col("cnt")).otherwise(F.lit(0))).alias("t_valid"),
        F.sum(F.when(valid, c * F.log(c)).otherwise(z)).alias("a"),
        F.sum(F.when(valid, c * F.log(q)).otherwise(z)).alias("b"),
        F.sum(F.when(valid, q).otherwise(z)).alias("cc"),
        F.sum(F.when(valid, q * F.log(c)).otherwise(z)).alias("d"),
        F.sum(F.when(valid, q * F.log(q)).otherwise(z)).alias("e"),
    )
    t = F.col("t_all").cast("double")
    tv = F.col("t_valid").cast("double")
    lnt = F.log(t)
    psi = (
        (F.col("a") - F.col("b")) / t
        - (tv / t) * lnt
        - F.col("d")
        + F.col("cc") * lnt
        + F.col("e")
    )
    return comp.select(
        F.col("w2.start").alias("window_start"),
        F.col("t_all").alias("n_events"),
        F.round(psi, 6).alias("psi"),
    )


@register(
    "stream_drift_psi",
    group="I",
    oracle=f"""
    with bh as (
      select least(9, cast(floor(value / 50) as int)) as bin,
             cast(count(*) as double)
               / (select count(*) from events
                  where ts < timestamp '{_DRIFT_SPLIT}') as p_base
      from events where ts < timestamp '{_DRIFT_SPLIT}'
      group by 1
    ),
    cur as (
      select date_trunc('day', ts) as d,
             least(9, cast(floor(value / 50) as int)) as bin,
             count(*) as cnt
      from events where ts >= timestamp '{_DRIFT_SPLIT}'
      group by 1, 2
    ),
    tot as (select d, cast(sum(cnt) as bigint) as t from cur group by 1)
    select cast(cur.d as timestamp) as window_start,
           max(tot.t) as n_events,
           round(sum(case when bh.p_base > 0 then
                 (cast(cnt as double) / tot.t - bh.p_base)
                 * ln((cast(cnt as double) / tot.t) / bh.p_base)
                 else 0.0 end), 6) as psi
    from cur
    join tot using (d)
    left join bh using (bin)
    group by cur.d
    order by cur.d
    """,
)
def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext: streaming distribution-drift monitor — per-day PSI of
    event values against a static pre-split baseline (the streaming
    face of catalog_drift_psi). Registered as its batch twin; the
    oracle computes PSI in the direct per-bin form, pinning that the
    decomposed streaming-safe algebra in build_drift_psi is the same
    statistic (float paths differ at ~1e-14, absorbed by round 6).
    tests/test_streaming.py runs the identical builder over
    readStream and asserts batch/stream equality."""
    e = load(spark, sf_dir, "events")
    return build_drift_psi(e, baseline_value_hist(e)).orderBy("window_start")


def run_txlog_stream_sink(spark: SparkSession, src_dir: str, base: str) -> None:
    """Streaming half of stream_txlog_sink: every micro-batch commits
    one transaction-log version via the exactly-once epoch guard
    (txlog_write_commit) — a replayed epoch is a no-op, so the table
    never double-counts, and each commit is atomic (manifest rename).
    This upgrades the overwrite-by-epoch foreachBatch recipe: readers
    get snapshot isolation and time travel over the stream's history
    for free."""
    from datalakecrawler_spark.sources.txlog import txlog_write_commit

    raw = normalize_events_ts(
        spark.readStream.schema(events_source_schema(spark, src_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        txlog_write_commit(batch_df, base, "append", epoch=epoch_id)

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{base}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def run_delta_stream_sink(spark: SparkSession, src_dir: str, path: str) -> None:
    """Streaming half of stream_delta_sink: every micro-batch commits
    one Delta-protocol version carrying the spec's transaction
    identifier (``txn`` action, appId + epoch) — PROTOCOL.md's own
    idempotence mechanism for streaming writers. A replayed epoch
    finds its txn version already recorded and no-ops, so the table
    never double-counts across retries OR whole-query restarts, and
    the log on disk stays readable by any conforming Delta reader."""
    from datalakecrawler_spark.sources.delta_native import write_delta

    raw = normalize_events_ts(
        spark.readStream.schema(events_source_schema(spark, src_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_delta(
            batch_df, path, "append", txn=("stream_delta_sink", epoch_id)
        )

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{path}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


@register(
    "stream_delta_sink",
    group="I",
    oracle="""
    select cast(ts as date) as day, count(*) as n,
           count(distinct user_id) as n_users
    from events group by 1 order by 1
    """,
)
def stream_delta_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin: daily event volume + distinct users. The
    streaming half (run_delta_stream_sink) appends each micro-batch
    to a native Delta table under a txn-action idempotence guard;
    tests/test_streaming.py drives it, replays an epoch AND restarts
    the query to prove exactly-once, then asserts the table's HEAD
    snapshot aggregates to this twin."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )


@register(
    "stream_txlog_sink",
    group="I",
    oracle=f"""
    select event_type, count(*) as n, {SUM_D.format("value")} as total_value
    from events group by 1 order by 1
    """,
)
def stream_txlog_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin: per-type event totals. The streaming half
    (run_txlog_stream_sink) commits each micro-batch as a transaction-
    log version with an exactly-once epoch guard;
    tests/test_streaming.py drives it, REPLAYS an epoch to prove the
    guard, and asserts the HEAD snapshot aggregates to this twin."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .orderBy("event_type")
    )


def build_first_touch_state(events: DataFrame) -> DataFrame:
    """I-ext builder: per-user acquisition state — the keyed
    (first_seen_day, n_events) pair maintained with
    applyInPandasWithState: the streaming half of
    events_new_vs_returning's growth accounting. first_seen is a
    KEEP-MIN merge and the count a plain sum — both exact-merge
    state transitions, so replays/restarts converge to the batch
    answer (the idempotence policy every stateful op here follows).
    Update-mode emission: one row per user per touched batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("first_day", T.DateType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("first_day_ord", T.LongType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import datetime as dt

        if state.exists:
            first_ord, cnt = state.get
        else:
            first_ord, cnt = None, 0
        for pdf in pdfs:
            days = pd.to_datetime(pdf["ts"]).dt.date
            mn = min(days).toordinal()
            first_ord = mn if first_ord is None else min(first_ord, mn)
            cnt += len(pdf)
        state.update((first_ord, cnt))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_day": [dt.date.fromordinal(first_ord)],
                "n_events": [cnt],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_first_touch_state",
    group="I",
    oracle="""
    select user_id,
           cast(date_trunc('day', min(ts)) as date) as first_day,
           count(*) as n_events
    from events group by user_id
    """,
)
def stream_first_touch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin of build_first_touch_state (stream equality
    asserted in test_streaming): per-user first-seen day + lifetime
    event count — the acquisition ledger events_new_vs_returning
    aggregates into the daily new/returning split. Keep-min +
    counter state merges exactly, so the streaming version converges
    to this batch rollup under any replay."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("first_day"),
        F.count(F.lit(1)).alias("n_events"),
    )


def build_error_rate_alarm(events: DataFrame) -> DataFrame:
    """I-ext: per-hour error-rate monitor with an exact-integer alarm
    gate (5*errors > total ⇔ rate > 20%) — the streaming health alarm
    every ingestion pipeline runs. Pure windowed aggregation +
    projection: fully incremental under watermark, no ranking or
    stateful custom logic, so the SAME plan object serves batch and
    stream (batch/stream parity asserted in test_streaming)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_err"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "n",
            "n_err",
            F.round(F.col("n_err") / F.col("n"), 6).alias("err_rate"),
            (F.col("n_err") * 5 > F.col("n")).alias("alarm"),
        )
    )


@register(
    "stream_error_rate_alarm",
    group="I",
    oracle="""
    with h as (
      select to_timestamp(cast(floor(epoch(ts) / 3600) * 3600 as bigint))
               ::timestamp as w_start,
             cast(count(*) as bigint) as n,
             cast(sum(case when event_type = 'error' then 1 else 0 end)
                  as bigint) as n_err
      from events group by 1
    )
    select w_start, n, n_err,
           round(cast(n_err as double) / n, 6) as err_rate,
           n_err * 5 > n as alarm
    from h
    """,
)
def stream_error_rate_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin of the hourly error-rate alarm (stream
    equality asserted in test_streaming)."""
    return build_error_rate_alarm(load(spark, sf_dir, "events"))


@register(
    "events_watermark_lateness_profile",
    group="I",
    oracle="""
    with arr as (
      select ts,
             max(ts) over (order by event_id
                           rows between unbounded preceding and current row)
               as high_watermark
      from events
    ),
    lat as (
      select cast(floor((epoch(high_watermark) - epoch(ts)) / 600.0)
                  as bigint) as late_bucket_10m
      from arr
    )
    select late_bucket_10m,
           count(*) as n_events,
           round(count(*) * 1.0 / sum(count(*)) over (), 6) as share
    from lat group by late_bucket_10m
    """,
)
def events_watermark_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the measurement that CHOOSES a
    watermark: replay events in arrival order (event_id is the ingest
    sequence), track the running max event-time (exactly Structured
    Streaming's watermark input), and histogram each event's lateness
    behind it in 10-minute buckets. The share column reads directly as
    'a watermark of X minutes would have dropped this fraction'.
    Batch formulation of streaming-internal state; at scale arrival
    order is per-source-partition, so the window partitions by source
    shard and the buckets merge — one sort, one grouped count."""
    from pyspark.sql import Window as W

    from datalakecrawler_spark.distrank import with_global_cummax

    e = normalize_events_ts(load(spark, sf_dir, "events"))
    # distributed running max (watermark replay) over arrival order
    arr = with_global_cummax(
        e.select("event_id", "ts"), ["event_id"], "ts", out="high_watermark"
    ).select("ts", "high_watermark")
    lat = arr.select(
        F.floor(
            (F.col("high_watermark").cast("long") - F.col("ts").cast("long"))
            / F.lit(600.0)
        ).alias("late_bucket_10m")
    )
    tot = W.partitionBy()
    return (
        lat.groupBy("late_bucket_10m")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "late_bucket_10m",
            "n_events",
            F.round(F.col("n_events") / F.sum("n_events").over(tot), 6).alias("share"),
        )
    )


def run_iceberg_stream_sink(spark: SparkSession, src_dir: str, path: str) -> None:
    """Streaming half of stream_iceberg_sink: every micro-batch
    appends one Iceberg snapshot stamped with the writer's epoch in
    the snapshot summary (the engine convention — e.g. Flink's
    max-committed-checkpoint-id) — so a replayed epoch finds itself
    already committed and no-ops. Exactly-once across retries AND
    whole-query restarts, and the table on disk is ordinary Iceberg
    metadata any conforming reader consumes."""
    from datalakecrawler_spark.sources.iceberg_native import write_iceberg

    raw = normalize_events_ts(
        spark.readStream.schema(events_source_schema(spark, src_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_iceberg(
            batch_df, path, "append", txn=("stream_iceberg_sink", epoch_id)
        )

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{path}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


@register(
    "stream_iceberg_sink",
    group="I",
    oracle=f"""
    select cast(ts as date) as day, count(*) as n,
           count(distinct user_id) as n_users
    from events group by day order by day
    """,
)
def stream_iceberg_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I-ext batch twin: daily event volume + distinct users. The
    streaming half (run_iceberg_stream_sink) appends each micro-batch
    as an Iceberg snapshot under a summary-stamped epoch idempotence
    guard; tests/test_streaming.py drives it, replays an epoch AND
    restarts the query to prove exactly-once, then asserts the table's
    HEAD snapshot aggregates to this twin."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )
