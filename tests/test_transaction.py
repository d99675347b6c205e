"""Multi-table atomic transactions: the rename to ``.commit.json`` is the
commit point; recovery rolls pending transactions back and committed ones
forward, idempotently, including over concurrent commits."""

import os

import pyspark.sql.functions as F
import pytest

from nessie_spark import synth
from nessie_spark.lakehouse import jobs, transaction
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table
from tests.conftest import make_table


def _df(spark, n, seed, prefix):
    return synth.images_df(spark, n, seed=seed).withColumn(
        "image_id", F.concat(F.lit(prefix), F.col("image_id"))
    )


def _two_tables(spark, tmp_path):
    ta, _ = make_table(spark, str(tmp_path / "ta"))
    tb, _ = make_table(spark, str(tmp_path / "tb"))
    return ta, tb


def test_commit_publishes_both_tables(spark, tmp_path):
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t1")
    txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t1-a")
    txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="t1-b")
    # staged: neither table's readers see anything yet
    assert scan(spark, ta.refresh()).count() == 256
    assert scan(spark, tb.refresh()).count() == 256
    txn.commit()
    assert scan(spark, ta.refresh()).count() == 256 + 16
    assert scan(spark, tb.refresh()).count() == 256 + 8
    assert os.path.exists(os.path.join(log, "txn-t1.done.json"))
    pins = transaction.consistent_snapshots(log, "t1")
    assert set(pins) == {ta.root, tb.root}


def test_crash_before_commit_point_rolls_back(spark, tmp_path):
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t2")
    sa = txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t2-a")
    txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="t2-b")
    # CRASH here: commit() never ran — the intent file is still .pending
    res = transaction.recover(log)
    assert res["rolled_back"] == ["t2"] and not res["rolled_forward"]
    ta, tb = ta.refresh(), tb.refresh()
    assert scan(spark, ta).count() == 256
    assert scan(spark, tb).count() == 256
    # the staged marker is cleared → branch is ordinary expirable history
    assert not ta.snapshot(sa).get("staged")
    # recovery is idempotent
    assert transaction.recover(log) == {
        "rolled_forward": [], "rolled_back": [], "failed": [],
    }


def test_crash_after_commit_point_rolls_forward(spark, tmp_path):
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t3")
    txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t3-a")
    txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="t3-b")
    # simulate: the rename to .commit.json happened, then the process died
    # before any publish
    os.replace(
        os.path.join(log, "txn-t3.pending.json"),
        os.path.join(log, "txn-t3.commit.json"),
    )
    res = transaction.recover(log)
    assert res["rolled_forward"] == ["t3"]
    assert scan(spark, ta.refresh()).count() == 256 + 16
    assert scan(spark, tb.refresh()).count() == 256 + 8


def test_crash_mid_publish_skips_already_published(spark, tmp_path):
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t4")
    sa = txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t4-a")
    sb = txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="t4-b")
    os.replace(
        os.path.join(log, "txn-t4.pending.json"),
        os.path.join(log, "txn-t4.commit.json"),
    )
    # first participant was published before the crash
    ta.refresh().publish_snapshot(sa)
    res = transaction.recover(log)
    assert res["rolled_forward"] == ["t4"]
    ta, tb = ta.refresh(), tb.refresh()
    assert ta.current_snapshot_id == sa and tb.current_snapshot_id == sb
    assert scan(spark, tb).count() == 256 + 8


def test_recover_replays_over_concurrent_commit(spark, tmp_path):
    """A commit that lands between staging and recovery does not block the
    transaction: the staged append is cherry-picked onto the new head and
    BOTH writes are visible."""
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t5")
    txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t5-a")
    txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="t5-b")
    os.replace(
        os.path.join(log, "txn-t5.pending.json"),
        os.path.join(log, "txn-t5.commit.json"),
    )
    # concurrent writer advances table B after the crash
    jobs.append(spark, tb.refresh(), _df(spark, 4, 13, "mid-"), job_id="mid")
    res = transaction.recover(log)
    assert res["rolled_forward"] == ["t5"]
    tb = tb.refresh()
    assert scan(spark, tb).count() == 256 + 8 + 4
    ids = {r.image_id for r in scan(spark, tb).select("image_id").collect()}
    assert any(i.startswith("xb-") for i in ids)
    assert any(i.startswith("mid-") for i in ids)


def test_abort_drops_everything(spark, tmp_path):
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t6")
    txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t6-a")
    txn.abort()
    assert scan(spark, ta.refresh()).count() == 256
    assert os.path.exists(os.path.join(log, "txn-t6.aborted.json"))
    with pytest.raises(ValueError, match="already aborted"):
        txn.commit()


def test_stage_rejects_published_snapshot(spark, tmp_path):
    ta, _ = make_table(spark, str(tmp_path / "ta"))
    log = str(tmp_path / "txnlog")
    sid = jobs.append(spark, ta, _df(spark, 4, 3, "p-"), job_id="plain")
    txn = transaction.Transaction(log, txn_id="t7")
    with pytest.raises(ValueError, match="not staged"):
        txn.stage(Table.load(ta.root), sid)


def test_consistent_snapshots_pin_cross_table_reads(spark, tmp_path):
    """The pinned view of a committed txn is torn-read-free even after a
    later commit moved one of the tables."""
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    txn = transaction.Transaction(log, txn_id="t8")
    txn.stage_append(spark, ta, _df(spark, 16, 7, "xa-"), job_id="t8-a")
    txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="t8-b")
    txn.commit()
    jobs.append(spark, ta.refresh(), _df(spark, 4, 13, "later-"), job_id="later")
    pins = transaction.consistent_snapshots(log, "t8")
    assert scan(spark, Table.load(ta.root), snapshot_id=pins[ta.root]).count() == 272
    assert scan(spark, Table.load(tb.root), snapshot_id=pins[tb.root]).count() == 264


def test_recover_isolates_failing_transactions(spark, tmp_path):
    """One unrecoverable record (corrupt JSON here — the cheapest stand-in
    for an expired participant) is reported in ``failed`` and does NOT
    block the redo/undo of later transactions."""
    ta, tb = _two_tables(spark, tmp_path)
    log = str(tmp_path / "txnlog")
    os.makedirs(log, exist_ok=True)
    # txn-a sorts first and cannot be replayed
    with open(os.path.join(log, "txn-aaa.commit.json"), "w") as fh:
        fh.write("{not json")
    txn = transaction.Transaction(log, txn_id="zzz")
    txn.stage_append(spark, tb, _df(spark, 8, 9, "xb-"), job_id="zzz-b")
    # crash before commit: txn-zzz must still roll back
    res = transaction.recover(log)
    assert res["rolled_back"] == ["zzz"]
    assert [f["txn_id"] for f in res["failed"]] == ["aaa"]
    assert scan(spark, tb.refresh()).count() == 256
    # the failed record stays in the log for a later retry
    assert os.path.exists(os.path.join(log, "txn-aaa.commit.json"))
