"""Streaming twins of the batch operators.

State discipline at scale: every stateful op carries a watermark so state
is evicted — unbounded dropDuplicates state is the classic 100 TB streaming
failure mode. Output modes chosen so sinks see only finalized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup on a stream: the watermark bounds the dedup state
    window — duplicates farther apart than the watermark are out of
    contract (they are caught by the batch dedup_exact pass in the
    lakehouse).

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: with plain
    dropDuplicates the watermark only evicts state when the event-time
    column is part of the key, so keyed dedup state would grow without
    bound — the exact failure mode this module exists to prevent.

    Streaming twin of operators/dedup.dedup_exact."""
    deduped = events.withWatermark(ts_col, watermark)
    if events.isStreaming:
        return deduped.dropDuplicatesWithinWatermark(key_cols)
    # batch twin for parity tests: no state to bound
    return deduped.dropDuplicates(key_cols)


def sessionize_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` — the
    streaming twin of operators/events.events_sessionize (gap-based, same
    per-user outputs), for when ``session_window`` can't express the logic
    (here: running max session duration across the user's whole history).

    State per user_id is O(1) — six longs (closed-session aggregates + the
    open session) — NOT the event buffer; at 10^9 users the state store
    stays bounded and each micro-batch is a single shuffle on user_id.
    Events must arrive per-user in ts order across micro-batches (upstream
    watermark/sort contract); within a batch we sort in-kernel.

    Input: DataFrame[user_id long, t long (epoch seconds)], streaming.
    Output (update mode): user_id, n_sessions, n_events, max_session_s.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, n_sessions long, n_events long, max_session_s long"
    )
    state_schema = (
        "n_sessions long, n_events long, max_closed long, "
        "cur_start long, cur_last long"
    )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf["t"])
        ts.sort()
        if state.exists:
            n_sessions, n_events, max_closed, cur_start, cur_last = state.get
        else:
            n_sessions, n_events, max_closed, cur_start, cur_last = 0, 0, 0, -1, -1
        for t in ts:
            n_events += 1
            if cur_start < 0:
                n_sessions += 1
                cur_start = cur_last = t
            elif t - cur_last > gap_s:
                max_closed = max(max_closed, cur_last - cur_start)
                n_sessions += 1
                cur_start = cur_last = t
            else:
                cur_last = t
        state.update((n_sessions, n_events, max_closed, cur_start, cur_last))
        cur_dur = (cur_last - cur_start) if cur_start >= 0 else 0
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_sessions": n_sessions,
                    "n_events": n_events,
                    "max_session_s": max(max_closed, cur_dur),
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def hourly_rollup_stream(
    events: DataFrame, ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed rollup with late-data handling: the streaming twin of
    operators/events.events_hourly (same grouping keys and aggregates —
    except ``n_users``, where exact countDistinct is unsupported in
    streaming aggregations, so the twin reports
    ``approx_count_distinct`` (HLL, default 5% relative error) under the
    same column name; consumers moving between modes keep the column but
    must treat it as approximate in streaming)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).alias("sum_value_d"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            F.col("sum_value_d").cast("double").alias("sum_value"),
            "n_users",
        )
    )
