"""DML (INSERT/UPDATE/DELETE/MERGE), catalog durability across engine
restarts, and endpoint-state surfacing."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from quasar_destination_h2_spark import server as server_mod
from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.errors import NotAResource
from quasar_destination_h2_spark.types import Column, ColumnType


@pytest.fixture()
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


COLS = [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)]


def _load(engine, name="dml_t", rows=b"1,a\r\n2,b\r\n3,c\r\n"):
    engine.csv_create_sink().consume(f"/{name}", COLS, rows)
    return name


def test_insert_into_appends(engine):
    t = _load(engine)
    n = engine.insert_into(t, COLS, b"4,d\r\n5,e\r\n")
    assert n == 2
    got = sorted((float(r.k), r.v) for r in engine.table(t).collect())
    assert got == [(1.0, "a"), (2.0, "b"), (3.0, "c"), (4.0, "d"), (5.0, "e")]


def test_insert_into_missing_table(engine):
    with pytest.raises(NotAResource):
        engine.insert_into("nope", COLS, b"1,a\r\n")


def test_delete_where(engine):
    t = _load(engine)
    n = engine.delete_where(t, "k >= 2")
    assert n == 2
    got = [(float(r.k), r.v) for r in engine.table(t).collect()]
    assert got == [(1.0, "a")]


def test_update_where(engine):
    t = _load(engine)
    n = engine.update_where(t, {"v": "upper(v)"}, "k <= 2")
    assert n == 2
    got = sorted((float(r.k), r.v) for r in engine.table(t).collect())
    assert got == [(1.0, "A"), (2.0, "B"), (3.0, "c")]


def test_merge_upsert(engine):
    t = _load(engine)
    from decimal import Decimal

    src = engine.table(t).sparkSession.createDataFrame(
        [(Decimal(2), "B2"), (Decimal(9), "new")], schema=engine.table(t).schema
    )
    engine.merge_into(t, src, ["k"])
    got = sorted((float(r.k), r.v) for r in engine.table(t).collect())
    assert got == [(1.0, "a"), (2.0, "B2"), (3.0, "c"), (9.0, "new")]


def test_catalog_survives_restart(spark, warehouse_dir):
    cfg = json.dumps({"connectionUri": warehouse_dir})
    e1 = Engine.from_config(cfg, spark=spark)
    hostile = 'restart"; DROP TABLE x; --'
    e1.csv_create_sink().consume(f"/{hostile}", COLS, b"7,z\r\n")
    # fresh engine, same warehouse/session: mapping must rehydrate
    e2 = Engine.from_config(cfg, spark=spark)
    got = e2.table(hostile).collect()
    assert [(float(r.k), r.v) for r in got] == [(7.0, "z")]
    e2.drop_table_if_exists(hostile)
    e3 = Engine.from_config(cfg, spark=spark)
    with pytest.raises(NotAResource):
        e3.table(hostile)


def test_endpoint_state_started_and_degraded(spark, warehouse_dir, monkeypatch):
    cfg = json.dumps(
        {"connectionUri": warehouse_dir, "server": {"tcp": ["-tcpPort", "10321"]}}
    )
    # started branch: pyspark ships the thriftserver jars, the
    # endpoint really serves (a TCP connect succeeds)
    e = Engine.from_config(cfg, spark=spark)
    assert e.endpoint_started is True
    import socket

    s = socket.socket()
    try:
        s.settimeout(10)
        s.connect(("127.0.0.1", 10321))
    finally:
        s.close()
    e.close()
    assert e.endpoint_started is False
    # degraded branch (jars absent in a slim image): must be visible
    # in engine state, not just logs
    monkeypatch.setattr(
        server_mod, "start_sql_endpoint", lambda _spark, _args: None
    )
    e2 = Engine.from_config(cfg, spark=spark)
    assert e2.endpoint_started is False


def test_endpoint_port_mapping():
    assert server_mod.endpoint_port(["-tcpPort", "9999"]) == "9999"
    assert server_mod.endpoint_port(["-pgPort", "5435", "-pgAllowOthers"]) == "5435"
    assert server_mod.endpoint_port(["-baseDir", "/tmp"]) is None


def test_concurrent_engines_do_not_lose_entries(spark, warehouse_dir):
    """r4 multi-writer protocol: a stale engine's persist must MERGE
    with — not clobber — entries another engine added after it
    rehydrated, and a drop must not be resurrected by a later
    stale-engine persist."""
    cfg = json.dumps({"connectionUri": warehouse_dir})
    e_stale = Engine.from_config(cfg, spark=spark)  # rehydrates empty
    e_other = Engine.from_config(cfg, spark=spark)
    e_other.csv_create_sink().consume("/first_t", COLS, b"1,a\r\n")
    # the stale engine never heard of first_t; its push used to
    # full-overwrite the metadata table and lose it
    e_stale.csv_create_sink().consume("/second_t", COLS, b"2,b\r\n")
    fresh = Engine.from_config(cfg, spark=spark)
    assert [(float(r.k), r.v) for r in fresh.table("first_t").collect()] == [
        (1.0, "a")
    ]
    assert [(float(r.k), r.v) for r in fresh.table("second_t").collect()] == [
        (2.0, "b")
    ]
    # tombstone: drop in one engine, then a persist from an engine
    # that still believes the table exists must not resurrect it...
    fresh.drop_table_if_exists("first_t")
    e_later = Engine.from_config(cfg, spark=spark)
    assert "first_t" not in e_later.sink.catalog
    # ...but e_other DOES still believe in first_t (stale in-memory
    # view), so its next persist re-publishes it — last-writer-wins
    # per key is the documented same-host contract; what can never
    # happen is an unrelated key vanishing:
    e_other.csv_create_sink().consume("/third_t", COLS, b"3,c\r\n")
    e_final = Engine.from_config(cfg, spark=spark)
    assert "second_t" in e_final.sink.catalog
    assert "third_t" in e_final.sink.catalog


# Runs in a SEPARATE python process: its own JVM, its own
# SparkSession, its own session catalog — only the warehouse
# directory (argv[1]) is shared with the parent test session.
_SUBPROC_WRITER = """
import json, sys
from pyspark.sql import SparkSession

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.types import Column, ColumnType

wd = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("xp-writer")
    .config("spark.sql.warehouse.dir", wd)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
try:
    e = Engine.from_config(json.dumps({"connectionUri": wd}), spark=spark)
    cols = [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)]
    e.csv_create_sink().consume("/xp_child", cols, b"9,child\\r\\n")
    assert "xp_child" in e.sink.catalog
finally:
    spark.stop()
"""


def test_cross_process_persist_merges(spark, warehouse_dir, tmp_path):
    """The cross-PROCESS half of the r4 multi-writer protocol, which
    test_concurrent_engines_do_not_lose_entries cannot see (all its
    engines share one SparkSession, whose saveAsTable invalidates the
    shared relation cache for free).

    Reproduces the r4-advice lost-update: the parent session primes
    its relation cache for the metadata table, a SEPARATE process
    overwrites the metadata parquet (deleting the cached part files),
    and the parent then persists. _read_disk_catalog must re-read the
    warehouse files fresh — a stale/partial read swallowed to {}
    would merge-clobber the child's entry."""
    from quasar_destination_h2_spark.sources.sink import CATALOG_TABLE

    cfg = json.dumps({"connectionUri": warehouse_dir})
    e_parent = Engine.from_config(cfg, spark=spark)
    e_parent.csv_create_sink().consume("/xp_parent", COLS, b"1,p\r\n")
    # Prime this session's cached relation (incl. its file listing)
    # for the metadata table — the ingredient of the stale read.
    spark.table(CATALOG_TABLE).collect()

    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(sys.modules[Engine.__module__].__file__))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SUBPROC_WRITER, warehouse_dir],
        cwd=str(tmp_path),  # keep any derby/metastore litter out of the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # Parent persists AFTER the other process rewrote the metadata
    # table: the merge must keep xp_child.
    e_parent.csv_create_sink().consume("/xp_parent2", COLS, b"2,q\r\n")
    e_fresh = Engine.from_config(cfg, spark=spark)
    for name in ("xp_parent", "xp_child", "xp_parent2"):
        assert name in e_fresh.sink.catalog, name
    assert [(float(r.k), r.v) for r in e_fresh.table("xp_child").collect()] == [
        (9.0, "child")
    ]


def test_corrupt_catalog_metadata_quarantined(spark, warehouse_dir):
    """A crashed writer's truncated metadata part file must not block
    consume() forever: decode-time corruption is quarantined (renamed
    aside with a warning — never deleted) and the catalog rebuilds
    from sha-deterministic physical names (r5-advice item 4)."""
    import glob
    import warnings as warnings_mod

    from quasar_destination_h2_spark.sources.sink import (
        CATALOG_TABLE,
        warehouse_path,
    )

    cfg = json.dumps({"connectionUri": warehouse_dir})
    e1 = Engine.from_config(cfg, spark=spark)
    e1.csv_create_sink().consume("/quarantine_t1", COLS, b"1,a\r\n")
    meta = warehouse_path(spark, CATALOG_TABLE)
    parts = glob.glob(os.path.join(meta, "part-*"))
    assert parts, "catalog metadata table was never persisted"
    for p in parts:
        # keep the head magic, destroy the footer: the decode-time
        # signature of a writer that died mid-stream
        with open(p, "wb") as fh:
            fh.write(b"PAR1truncated-mid-write-no-footer")

    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        # the best-effort rehydrate inside from_config is the first
        # reader to trip over the corruption and quarantine it
        e2 = Engine.from_config(cfg, spark=spark)
        e2.csv_create_sink().consume("/quarantine_t2", COLS, b"2,b\r\n")
    assert glob.glob(meta + ".corrupt-*"), "corrupt dir was not renamed aside"
    assert any("quarantined" in str(w.message) for w in caught)
    assert e2.table("quarantine_t2").count() == 1


def test_alter_table_rename_to(engine):
    """ALTER TABLE ... RENAME TO (H2 grammar, r10): O(1) catalog
    remap — data readable under the new name, old name gone, clash
    and missing-table cases loud."""
    _load(engine, "ren_src")
    n_before = engine.table("ren_src").count()
    assert engine.execute_sql("ALTER TABLE ren_src RENAME TO ren_dst") is None
    assert engine.table("ren_dst").count() == n_before
    assert "ren_src" not in engine.sink.catalog
    # statement surface sees the new name; introspection follows
    assert engine.execute_sql("DELETE FROM ren_dst WHERE k = 1") == 1
    rows = engine.execute_sql(
        "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
        "WHERE TABLE_NAME IN ('ren_src', 'ren_dst')"
    ).collect()
    assert [r.TABLE_NAME for r in rows] == ["ren_dst"]
    # unknown tables fall through to Spark (same as every ALTER form)
    with pytest.raises(Exception, match="not found|cannot be found"):
        engine.execute_sql("ALTER TABLE ren_src RENAME TO ren_x")
    _load(engine, "ren_other")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute_sql("ALTER TABLE ren_other RENAME TO REN_DST")


def test_drop_all_objects(engine):
    """H2's DROP ALL OBJECTS empties the engine catalog and the
    sequence registry in one statement."""
    _load(engine, "dao_a")
    _load(engine, "dao_b")
    engine.execute_sql("DROP SEQUENCE IF EXISTS dao_s")
    engine.execute_sql("CREATE SEQUENCE dao_s")
    assert engine.execute_sql("DROP ALL OBJECTS") is None
    assert engine.sink.catalog == {}
    assert engine.sequences.names() == []
    assert engine.execute_sql("SHOW TABLES").count() == 0
