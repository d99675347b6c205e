"""Semantics tests for the OLAP-breadth wave: ROLLUP grouping sets,
frame-spec rolling windows, and iterative integer PageRank.

The oracle gate proves cross-engine hash-exactness; these tests prove the
SEMANTICS are right (subtotals reconcile, frames sum the right rows, rank
mass flows toward hubs) on hand-checkable shapes.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_rollup_levels_reconcile(spark):
    from nessie_spark.operators.analytics import rollup_pricing_levels

    df = rollup_pricing_levels(spark, SF).collect()
    detail = [r for r in df if r.lvl == 0]
    subtotal = [r for r in df if r.lvl == 1]
    grand = [r for r in df if r.lvl == 3]
    assert len(grand) == 1
    assert grand[0].returnflag == "ALL" and grand[0].linestatus == "ALL"
    # grand total = sum of detail rows, exactly (decimal discipline)
    assert grand[0].count_order == sum(r.count_order for r in detail)
    assert grand[0].sum_qty == pytest.approx(sum(r.sum_qty for r in detail))
    assert grand[0].sum_disc_price == pytest.approx(
        sum(r.sum_disc_price for r in detail)
    )
    # each returnflag subtotal = sum of its detail rows
    for s in subtotal:
        mine = [r for r in detail if r.returnflag == s.returnflag]
        assert s.linestatus == "ALL"
        assert s.count_order == sum(r.count_order for r in mine)
        assert s.sum_qty == pytest.approx(sum(r.sum_qty for r in mine))
        assert s.sum_disc_price == pytest.approx(
            sum(r.sum_disc_price for r in mine)
        )
    # lvl 2 (linestatus-only subtotal) never appears under ROLLUP
    assert not [r for r in df if r.lvl == 2]


def test_rolling_windows_frames(spark):
    from nessie_spark.operators.events import events_rolling_windows

    df = events_rolling_windows(spark, SF)
    one_user = df.where(F.col("user_id") == df.first().user_id).collect()
    assert [r.rn for r in one_user] == list(range(1, len(one_user) + 1))
    assert one_user[0].gap_us == -1  # stream-head sentinel
    assert all(r.gap_us >= 0 for r in one_user[1:])
    # reconstruct v_micro from the cumulative column, then re-check roll4
    vs = [one_user[0].cum_value_micro] + [
        one_user[i].cum_value_micro - one_user[i - 1].cum_value_micro
        for i in range(1, len(one_user))
    ]
    for i, r in enumerate(one_user):
        assert r.roll4_value_micro == sum(vs[max(0, i - 3): i + 1])
    assert one_user[-1].cum_value_micro == sum(vs)


def test_pagerank_mass_and_hubs(spark):
    from nessie_spark.operators.dedup import PR_SCALE, pagerank_neardup

    rows = pagerank_neardup(spark, SF).collect()
    n = len(rows)
    assert n > 0 and len({r.vec_id for r in rows}) == n
    iso = [r for r in rows if r.deg == 0]
    hubs = sorted((r for r in rows if r.deg > 0), key=lambda r: -r.deg)
    # isolated nodes converge to the teleport floor exactly
    assert all(r.rank == PR_SCALE * 15 // 100 for r in iso)
    if hubs:
        # connected nodes accumulate strictly more than the floor, and the
        # best-connected node outranks the median connected node
        assert all(r.rank > PR_SCALE * 15 // 100 for r in hubs)
        mid = hubs[len(hubs) // 2]
        assert hubs[0].rank >= mid.rank
    # integer mass never exceeds the initial total (damping only decays)
    assert sum(r.rank for r in rows) <= n * PR_SCALE


def test_pagerank_deterministic(spark):
    from nessie_spark.operators.dedup import pagerank_neardup

    a = {(r.vec_id, r.rank) for r in pagerank_neardup(spark, SF).collect()}
    b = {(r.vec_id, r.rank) for r in pagerank_neardup(spark, SF).collect()}
    assert a == b


def test_pagerank_driver_distributed_parity(spark, monkeypatch):
    """The size-gated driver path and the distributed loop are the SAME
    integer recurrence — forcing the gate to 0 must reproduce every rank
    bit-for-bit (the min_label_components dense-twin pattern)."""
    import nessie_spark.operators.dedup as dd

    fast = {(r.vec_id, r.deg, r.rank)
            for r in dd.pagerank_neardup(spark, SF).collect()}
    monkeypatch.setattr(dd, "PR_DRIVER_MAX_EDGES", 0)
    dist = {(r.vec_id, r.deg, r.rank)
            for r in dd.pagerank_neardup(spark, SF).collect()}
    assert fast == dist


def test_user_deciles_semantics(spark):
    """Deciles partition users into 10 near-equal ordered cohorts; ranks
    are monotone in total value; ppm fields hit their integer endpoints."""
    from nessie_spark.operators.events import events_user_deciles

    rows = events_user_deciles(spark, SF).collect()
    n = len(rows)
    assert n > 10
    # decile sizes differ by at most 1 (ntile contract)
    from collections import Counter

    sizes = Counter(r.decile for r in rows)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # decile is monotone in (total_value_micro, user_id)
    ordered = sorted(rows, key=lambda r: (r.total_value_micro, r.user_id))
    assert [r.decile for r in ordered] == sorted(r.decile for r in rows)
    # ppm endpoints: min rank -> 0, max rank -> exactly 1e6
    assert ordered[0].pct_rank_ppm == 0
    assert ordered[-1].pct_rank_ppm == 1_000_000
    assert ordered[-1].cume_ppm == 1_000_000
    # cume is rank/n in ppm (floor division)
    for i, r in enumerate(ordered):
        assert r.cume_ppm == (i + 1) * 1_000_000 // n


def test_cube_marginals_reconcile(spark):
    """CUBE: both marginals and the grand total must each sum the detail
    rows exactly (decimal discipline)."""
    from nessie_spark.operators.analytics import cube_year_flag

    rows = cube_year_flag(spark, SF).collect()
    detail = [r for r in rows if r.lvl == 0]
    by_year = [r for r in rows if r.lvl == 1]   # grouping(flag)=1: year marginal
    by_flag = [r for r in rows if r.lvl == 2]   # grouping(year)=1: flag marginal
    grand = [r for r in rows if r.lvl == 3]
    assert len(grand) == 1
    assert grand[0].count_order == sum(r.count_order for r in detail)
    for m in by_year:
        mine = [r for r in detail if r.ship_year == m.ship_year]
        assert m.count_order == sum(r.count_order for r in mine)
        assert m.sum_qty == pytest.approx(sum(r.sum_qty for r in mine))
    for m in by_flag:
        mine = [r for r in detail if r.returnflag == m.returnflag]
        assert m.count_order == sum(r.count_order for r in mine)
        assert m.sum_disc_price == pytest.approx(sum(r.sum_disc_price for r in mine))


def test_time_rolling_frame_membership(spark):
    """RANGE frame: n_1h at each event equals the brute-force count of the
    user's events in [t-1h, t] for a sample of users (the in-frame SUM is
    hash-checked against DuckDB by the oracle gate)."""
    from collections import defaultdict

    from nessie_spark.operators.events import events_time_rolling

    rows = events_time_rolling(spark, SF).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    HOUR = 3_600_000_000
    checked = 0
    for uid in sorted(by_user)[:5]:
        evs = sorted(by_user[uid], key=lambda r: r.t_us)
        for r in evs:
            frame = [e for e in evs if r.t_us - HOUR <= e.t_us <= r.t_us]
            assert r.n_1h == len(frame), (uid, r.event_id)
            checked += 1
    assert checked > 20
