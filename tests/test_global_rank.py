"""plans/rank.global_row_number — the distributed swap-in for single-task
global windows. Parity against Window.orderBy row_number is the contract:
identical ranks at any partition count, including degenerate shapes."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from nessie_spark.plans.rank import global_row_number

SF = "/root/testdata/sf0.001"


def _expected(df, order_cols):
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return {
        tuple(r[c] for c in order_cols): r.rn
        for r in df.select("*", F.row_number().over(w).cast("long").alias("rn")).collect()
    }


def _got(df, order_cols, n_part):
    out = global_row_number(df, order_cols, num_partitions=n_part)
    return {tuple(r[c] for c in order_cols): r.rn for r in out.collect()}


def test_parity_with_window_row_number(spark):
    """Skewed duplicate-heavy keys, tie-broken to a total order; ranks must
    match the single-task window exactly at several partition counts."""
    df = spark.range(0, 997, 1, 8).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("uid")
    )
    exp = _expected(df, ["k", "uid"])
    for n_part in (1, 4, 17, 64):
        assert _got(df, ["k", "uid"], n_part) == exp, n_part


def test_small_inputs_and_empty_partitions(spark):
    """More partitions than rows: range partitioner leaves most empty;
    offsets must still fold correctly."""
    df = spark.range(0, 7, 1, 2).select(F.col("id").alias("uid"))
    got = _got(df, ["uid"], 32)
    assert got == {(i,): i + 1 for i in range(7)}
    one = spark.range(0, 1).select(F.col("id").alias("uid"))
    assert _got(one, ["uid"], 8) == {(0,): 1}


def test_rank_is_deterministic_across_runs(spark):
    df = spark.range(0, 500, 1, 8).select(
        (F.col("id") * 2654435761 % 1000).alias("k"), F.col("id").alias("uid")
    )
    a = _got(df, ["k", "uid"], 16)
    b = _got(df, ["k", "uid"], 16)
    assert a == b


def test_deciles_distributed_matches_window_variant(spark):
    """The two registry deciles plans (single-task window vs distributed
    rank) must return identical rows — the oracle gate proves this against
    DuckDB too, but here it holds at sf0.001's different user count."""
    from nessie_spark.operators.events import (
        events_user_deciles,
        events_user_deciles_distributed,
    )

    a = {tuple(r) for r in events_user_deciles(spark, SF).collect()}
    b = {tuple(r) for r in events_user_deciles_distributed(spark, SF).collect()}
    assert a == b


def test_distributed_plan_has_no_data_sized_global_window(spark):
    """The only Window in the distributed plan runs over the per-partition
    stats aggregate (one row per partition) — its child must be an
    aggregate, never the data-carrying range sort; the join-back must be
    broadcast."""
    import contextlib
    import io

    from nessie_spark.operators.events import events_user_deciles_distributed

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        events_user_deciles_distributed(spark, SF).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the Window node consumes the HashAggregate(_pid) output: in formatted
    # explain the Window's input column set is the stats triple, not the
    # user rollup (which carries n_events/total_value_micro + _mid)
    win = plan.split(") Window")[1]
    assert "_mid" not in win.split("Arguments")[0]
