"""Structured Streaming over the events table — engine extension.

The reference is batch-only (SURVEY §2.9); this module adds the
streaming shapes a landing-zone pipeline needs: tumbling-window
aggregation with a watermark, and a stateful per-user operator via
``applyInPandasWithState``. The batch-mode twin of the windowed
aggregation lives in queries/streaming_ops.py and is oracle-checked;
the streaming machinery itself is exercised in tests with the
file-source + ``availableNow`` trigger (the incremental / idempotent
load analog of load_facts.py:162-166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The testdata's events.ts is TIMESTAMP(NANOS) parquet. How a reader
# surfaces that differs by engine version: with the legacy nanosAsLong
# conf honored it's int64 nanos (LongType); on readers where that conf
# is inert (or removed) it's TIMESTAMP_NTZ. EVENTS_SCHEMA is the
# legacy-reader default; streaming entry points call
# events_stream_schema() to declare whatever THIS engine actually
# produces, so normalize_event_time's NTZ branch is exercised (not
# dead) wherever the conf no longer applies.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_schema(spark: SparkSession, src_dir: str) -> T.StructType:
    """Schema to declare for streaming reads of the events table.

    Streaming sources need an explicit schema, but the right declared
    type for ``ts`` depends on how the installed engine reads
    TIMESTAMP(NANOS) parquet under the legacy conf. Rather than guess
    by version string, ask the batch reader (a footer-only read — no
    data scanned) and declare what it reports; normalize_event_time
    then converts either form to TIMESTAMP_LTZ.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        observed = spark.read.parquet(src_dir).schema
        ts_type = {f.name: f.dataType for f in observed.fields}["ts"]
    except Exception:
        # No files yet (empty landing zone): fall back by engine
        # version, matching what the reader will produce when data
        # lands — Spark ≥4.1 surfaces TIMESTAMP(NANOS) as NTZ (the
        # legacy conf is inert there); older readers honor the conf
        # and produce int64 nanos.
        major, minor = (int(x) for x in spark.version.split(".")[:2])
        ts_type = (
            T.TimestampNTZType()
            if (major, minor) >= (4, 1)
            else T.LongType()
        )
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", ts_type)
            for f in EVENTS_SCHEMA.fields
        ]
    )


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP_LTZ — the only type
    `withWatermark` accepts — regardless of how the source surfaced it:
    int64 nanos (legacy nanosAsLong readers / our declared LongType
    schema) or TIMESTAMP_NTZ (Spark 4.1.x reads TIMESTAMP(NANOS)
    parquet as NTZ natively). Same contract as queries/common.py::t;
    callers pin the session TZ to UTC so NTZ→LTZ is the identity."""
    ts_type = dict(df.dtypes).get(col)
    if ts_type == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type counts + value sums (works on both batch
    and streaming DataFrames — same logical plan)."""
    return (
        events.groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, src_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """readStream variant with a watermark for late data."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = events_stream_schema(spark, src_dir)
    stream = normalize_event_time(
        spark.readStream.schema(schema).format("parquet").load(src_dir)
    ).withWatermark("ts", watermark)
    return windowed_counts(stream)


def run_available_now(agg: DataFrame, query_name: str) -> None:
    """Drain everything currently in the source into a memory sink —
    the availableNow triggered-batch pattern for incremental loads."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user session aggregation with
    applyInPandasWithState (streaming) — see tests for the harness."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n_events long, total_value double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def sessionize_closed(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-sessionization that emits a session ONLY when it closes —
    the production form of sessionize_stateful (which streams per-batch
    updates): downstream consumers get each session exactly once, final.

    applyInPandasWithState with EventTimeTimeout. A session is emitted
    ONLY once the watermark passes ``session_end + gap`` — an over-gap
    successor in the stream is NOT sufficient to close its predecessor,
    because a late event still inside the watermark can arrive later
    and bridge or extend it (emitting early would then produce
    overlapping sessions, violating the exactly-once-final contract).
    Per-key state is therefore the LIST of still-unclosable intervals,
    sorted by start — bounded by watermark_delay / gap intervals, so
    still O(1) per key for any fixed configuration; the timeout is the
    earliest interval's ``end + gap``, and each firing (or data batch)
    drains every interval the watermark has sealed. Requires a
    watermarked input (the timeout IS the watermark contract).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long"
    )
    state_schema = (
        "starts array<long>, ends array<long>, ns array<long>"
    )
    gap_ms = gap_minutes * 60 * 1000

    def emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "session_start": [
                    pd.Timestamp(s * 1_000_000) for s, _, _ in sessions
                ],
                "session_end": [
                    pd.Timestamp(e * 1_000_000) for _, e, _ in sessions
                ],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def load(state: GroupState):
        if not state.exists:
            return []
        starts, ends, ns = state.get
        return [
            (int(s), int(e), int(n)) for s, e, n in zip(starts, ends, ns)
        ]

    def settle(state: GroupState, merged):
        """Split merged intervals on the watermark seal: emit the ones
        the watermark has passed (end + gap <= wm — no in-watermark
        event can ever touch them again), retain the rest with the
        timeout at the earliest retained seal point."""
        wm = state.getCurrentWatermarkMs()
        closed = [iv for iv in merged if iv[1] + gap_ms <= wm]
        kept = [iv for iv in merged if iv[1] + gap_ms > wm]
        if kept:
            state.update(
                (
                    [s for s, _, _ in kept],
                    [e for _, e, _ in kept],
                    [n for _, _, n in kept],
                )
            )
            state.setTimeoutTimestamp(min(e for _, e, _ in kept) + gap_ms)
        elif state.exists:
            state.remove()
        return closed

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            closed = settle(state, load(state))
            if closed:
                yield emit(key, closed)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        # ts may be pandas Timestamp or raw int64 nanos — normalize to ms
        ts_ms = sorted(
            int(pd.Timestamp(v).value) // 1_000_000 for v in rows["ts"]
        )
        # Interval sweep: every stored interval plus the batch's
        # single-event intervals, sorted by start, neighbours merged
        # when within gap. The sweep handles cross-batch stragglers in
        # BOTH directions: an out-of-order event inside or just before
        # a stored interval merges (end = max, a session never
        # shrinks), a stray older than start - gap forms its own
        # interval, and a bridging event can legitimately FUSE two
        # stored intervals — which is exactly why nothing is emitted
        # before the watermark seals it (settle): emitting a
        # successor-closed interval early would make that fusion
        # produce overlapping output.
        items = sorted([(tm, tm, 1) for tm in ts_ms] + load(state))
        merged = []
        start = end = None
        n = 0
        for s_i, e_i, n_i in items:
            if start is None:
                start, end, n = s_i, e_i, n_i
            elif s_i - end <= gap_ms:
                end, n = max(end, e_i), n + n_i
            else:
                merged.append((start, end, n))
                start, end, n = s_i, e_i, n_i
        merged.append((start, end, n))
        closed = settle(state, merged)
        if closed:
            yield emit(key, closed)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def stream_dedup_events(
    spark: SparkSession, src_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once event dedup: dropDuplicatesWithinWatermark
    on the event id — the streaming form of dedup_exact for at-least-once
    sources (state is bounded by the watermark, so it runs forever)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = events_stream_schema(spark, src_dir)
    stream = normalize_event_time(
        spark.readStream.schema(schema).format("parquet").load(src_dir)
    ).withWatermark("ts", watermark)
    return stream.dropDuplicatesWithinWatermark(["event_id"])


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (gap-based) per user — works on batch and
    streaming inputs; the built-in counterpart of win_session_gap."""
    return (
        events.groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_stream_attribution(
    purchases: DataFrame,
    views: DataFrame,
    max_gap: str = "1 hour",
    purchase_watermark: str = "2 hours",
    view_watermark: str = "3 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    views by the same user within ``max_gap`` before it.

    The watermarks bound BOTH sides' join state (views held no longer
    than view_watermark + max_gap), so state is finite on an unbounded
    stream — the streaming form of the batch as-of/attribution join
    (operators/asof.py). Works on batch inputs with the same plan
    (watermarks are no-ops there).
    """
    p = (
        purchases.withWatermark("purchase_ts", purchase_watermark)
        .select("purchase_id", F.col("user_id").alias("p_user"), "purchase_ts")
    )
    v = views.withWatermark("view_ts", view_watermark).select(
        "view_id", F.col("user_id").alias("v_user"), "view_ts"
    )
    return p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "view_id",
        "view_ts",
    )


def transition_counts_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user event-type transition counts
    with ``applyInPandasWithState`` — the streaming twin of the batch
    ``event_transition_matrix`` query. State per user is the last seen
    (ts, event_id, event_type); each micro-batch sorts its rows in
    event order, chains them onto the stored last event, and emits the
    batch's (prev_type, next_type, n) pairs. Summing the emitted pairs
    over all batches equals the batch twin exactly — asserted in
    tests/test_streaming.py, including across a checkpoint restart so
    the cross-batch chaining (the part a naive per-batch lead() would
    get wrong) is what the test actually proves. Rows arriving at or
    before the stored last position are dropped (late data, same
    discipline as a watermark) so state never regresses.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, prev_type string, next_type string, n long"
    )
    state_schema = "last_ts long, last_event_id long, last_type string"

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "event_id"], ignore_index=True)
        last_type = None
        if state.exists:
            last_ts, last_event_id, last_type = state.get
            # Late-data guard: rows at or before the stored position
            # would chain transitions backwards AND regress the stored
            # last event — drop them (the same discipline a watermark
            # applies), keeping state monotone.
            ts_ns = rows["ts"].astype("int64")
            rows = rows[
                (ts_ns > last_ts)
                | ((ts_ns == last_ts) & (rows["event_id"] > last_event_id))
            ].reset_index(drop=True)
            if len(rows) == 0:
                return
        types = list(rows["event_type"])
        if last_type is not None:
            types = [last_type] + types
        last = rows.iloc[-1]
        # ts may surface as pandas Timestamp (TimestampNTZ) or as a raw
        # int64 (the nanosAsLong path on Spark < 4.1) — pd.Timestamp
        # normalizes both to epoch nanoseconds.
        state.update(
            (
                int(pd.Timestamp(last["ts"]).value),
                int(last["event_id"]),
                str(last["event_type"]),
            )
        )
        pairs: dict[tuple[str, str], int] = {}
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
        if not pairs:
            return
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pairs),
                "prev_type": [p[0] for p in pairs],
                "next_type": [p[1] for p in pairs],
                "n": list(pairs.values()),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def quality_gate_counts(docs: DataFrame) -> DataFrame:
    """Per-source Gopher-gate counts over a document relation — ONE
    logical plan shared by the batch twin (stream_quality_gate) and
    the readStream variant (test_streaming): Structured Streaming runs
    the same gate incrementally on a document feed, which is how a
    crawl ingests continuously instead of in daily batches. Pure
    column expressions + one aggregate: complete-mode-safe, no state
    beyond the per-source partials."""
    from pyspark.sql import functions as F

    from evolution_data_warehouse_spark.operators.gopher import (
        gopher_flags,
        gopher_metrics,
    )

    text = F.coalesce(F.col("text"), F.lit(""))
    ok = gopher_flags(gopher_metrics(text), min_words=20)["gopher_pass"]
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(ok.cast("int")).cast("bigint").alias("n_gopher_pass"),
    )
