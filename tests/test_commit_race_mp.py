"""TRUE multi-process commit race on the metadata put-if-absent.

test_concurrent_commits exercises racing THREADS through the full commit
loop; this module races two separate PROCESSES — barrier-released so both
hit ``Table._write_version``'s ``os.link`` put-if-absent in the same
instant — and proves, over many iterations, that exactly one writer wins
each version and the loser's optimistic retry (refresh → next version)
lands cleanly. This is the exact protocol a multi-driver deployment runs
against shared storage."""

import json
import multiprocessing as mp
import os

from nessie_spark.lakehouse.table import Table
from tests.conftest import make_table

N_ITER = 50


def _race_worker(root: str, target_v: int, tag: str, done_barrier, q) -> None:
    """Attempt to commit version ``target_v``; on losing the race, do the
    optimistic retry: refresh to the winner's version and commit the next
    one. Reports (tag, outcome, committed_version)."""
    t = Table.load(root)
    meta = dict(t.meta)
    meta["race_tag"] = tag
    won = True
    try:
        t._write_version(target_v, meta)
    except FileExistsError:
        won = False
    # both sides rendezvous so the loser's refresh observes the winner's
    # durable version file before retrying
    done_barrier.wait()
    if won:
        q.put((tag, "won", target_v))
        return
    t2 = Table.load(root)
    retry_v = t2.version + 1
    meta2 = dict(t2.meta)
    meta2["race_tag"] = f"{tag}-retry"
    t2._write_version(retry_v, meta2)
    q.put((tag, "retried", retry_v))


def _race_round(root, target_v, tag, start_barrier, done_barrier, q):
    start_barrier.wait()  # release both processes simultaneously
    _race_worker(root, target_v, tag, done_barrier, q)


def test_two_process_commit_race(spark, tmp_path):
    t, _ = make_table(spark, str(tmp_path / "race"))
    root = t.root
    ctx = mp.get_context("fork")
    for it in range(N_ITER):
        cur = Table.load(root).version
        target = cur + 1
        q = ctx.Queue()
        start_barrier = ctx.Barrier(2)
        done_barrier = ctx.Barrier(2)
        procs = []
        for tag in ("a", "b"):
            p = ctx.Process(
                target=_race_round,
                args=(root, target, tag, start_barrier, done_barrier, q),
            )
            p.start()
            procs.append(p)
        results = [q.get(timeout=30) for _ in range(2)]
        for p in procs:
            p.join(timeout=30)
            assert p.exitcode == 0, (it, results)
        outcomes = sorted(r[1] for r in results)
        # exactly one winner, one clean retry — never two winners, never
        # two losers, never a crash
        assert outcomes == ["retried", "won"], (it, results)
        won_v = next(r[2] for r in results if r[1] == "won")
        retry_v = next(r[2] for r in results if r[1] == "retried")
        assert won_v == target and retry_v == target + 1, (it, results)
        # both versions durable and parseable; hint points at the latest
        for v in (won_v, retry_v):
            with open(os.path.join(root, "metadata", f"v{v}.json")) as fh:
                json.load(fh)
        assert Table.load(root).version == retry_v
    # no interleaving ever lost a version: the log is dense 1..final
    final = Table.load(root).version
    assert final == Table.load(root).version
    missing = [
        v
        for v in range(1, final + 1)
        if not os.path.exists(os.path.join(root, "metadata", f"v{v}.json"))
    ]
    assert missing == []


def test_race_worker_meta_isolated(spark, tmp_path):
    """The loser's retry metadata derives from the WINNER's committed
    state (refresh-then-rebuild), not its own stale snapshot."""
    t, _ = make_table(spark, str(tmp_path / "iso"))
    root = t.root
    cur = Table.load(root).version
    meta = dict(Table.load(root).meta)
    meta["race_tag"] = "w"
    Table.load(root)._write_version(cur + 1, meta)
    t2 = Table.load(root)
    assert t2.version == cur + 1
    assert t2.meta.get("race_tag") == "w"
