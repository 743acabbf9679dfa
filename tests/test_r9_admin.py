"""Round-9 admin coverage (VERDICT r8 item 8): two engine instances
over ONE warehouse directory doing interleaved DML/upserts.

The engine model mirrors the reference's single shared connection
(main.go:70): every Engine in a process shares the SparkSession
singleton and therefore one temp-view catalog, so a table mutated by
two instances is the SAME relation — the assertions pin last-writer-
wins view swaps, per-statement scratch-view uniqueness (the r8
``_SCRATCH_IDS`` counter: concurrent DML must never share a scratch
name), and that interleaving leaves no orphaned scratch views behind.
Managed-table storage stays per-instance (``warehouse_dir_writable``
is a private mkdtemp), which the cross-instance test also pins.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engines(spark):
    e1 = Engine(warehouse_dir=SF_DIR, spark=spark)
    e2 = Engine(warehouse_dir=SF_DIR, spark=spark)
    return e1, e2


def _scratch_views(spark):
    return {
        t.name
        for t in spark.catalog.listTables()
        if t.isTemporary and t.name.startswith("__dd_upsert_src_")
    }


def test_two_writer_interleaved_upserts(engines):
    e1, e2 = engines
    before = _scratch_views(e1.spark)
    e1.run_script(
        "CREATE OR REPLACE TABLE tw (k INT PRIMARY KEY, v VARCHAR, n INT)"
    )
    # both instances see the shared relation immediately
    assert e2.sql("SELECT count(*) AS c FROM tw").collect()[0][0] == 0
    e1.run_script(
        "INSERT INTO tw VALUES (1, 'a', 0), (2, 'b', 0), (3, 'c', 0)"
    )
    # interleaved upserts: each statement runs to completion on the
    # shared view; later writers see earlier writers' swaps
    e2.run_script(
        "INSERT INTO tw VALUES (2, 'B2', 1), (4, 'd2', 1) "
        "ON CONFLICT (k) DO UPDATE SET v = excluded.v, n = tw.n + 1"
    )
    e1.run_script(
        "INSERT INTO tw VALUES (2, 'B1', 5), (5, 'e1', 5) "
        "ON CONFLICT (k) DO UPDATE SET v = excluded.v, n = tw.n + 1"
    )
    e2.run_script(
        "INSERT INTO tw VALUES (5, 'E2', 9) "
        "ON CONFLICT (k) DO UPDATE SET v = excluded.v, n = tw.n + 1"
    )
    rows = sorted(
        tuple(r) for r in e1.sql("SELECT k, v, n FROM tw").collect()
    )
    # last writer wins per key: k=2 updated by e2 then e1; k=5 inserted
    # by e1 then updated by e2
    assert rows == [
        (1, "a", 0),
        (2, "B1", 2),
        (3, "c", 0),
        (4, "d2", 1),
        (5, "E2", 6),
    ]
    # both instances read the same final state
    assert rows == sorted(
        tuple(r) for r in e2.sql("SELECT k, v, n FROM tw").collect()
    )
    # scratch views are LRU-retained (the swapped plan may still
    # reference them) — assert one UNIQUE view per upsert statement
    # (no collisions) and that the tracker keeps them bounded
    from duckdb_server_spark.dialect import _TEMP_VIEW_CAP, dialect_state

    after = _scratch_views(e1.spark)
    assert len(after - before) == 3  # three upserts, three distinct views
    assert len(dialect_state(e1.spark).temp_views) <= _TEMP_VIEW_CAP
    e1.run_script("DROP TABLE tw")


def test_scratch_ids_never_collide():
    from duckdb_server_spark.ddl import _SCRATCH_IDS

    seen = {next(_SCRATCH_IDS) for _ in range(100)}
    assert len(seen) == 100  # strictly monotonic process-wide counter


def test_managed_storage_is_per_instance(engines):
    e1, e2 = engines
    assert e1.warehouse_dir_writable() != e2.warehouse_dir_writable()


def test_interleaved_transactions_are_per_session_state(engines):
    # one shared DialectState per SparkSession: a transaction opened via
    # either instance is the same transaction (single shared connection,
    # main.go:70) — BEGIN on e1 then BEGIN on e2 must refuse
    e1, e2 = engines
    e1.run_script("BEGIN TRANSACTION")
    with pytest.raises(Exception, match="within a transaction"):
        e2.run_script("BEGIN TRANSACTION")
    e1.run_script("ROLLBACK")
