"""True cross-process durability: a table loaded by one engine
PROCESS must be addressable by logical name in a second process over
the same warehouse (the reference's H2 catalog is durable on disk;
Spark's default in-memory session catalog is not — the engine's own
warehouse-side catalog makes up the difference)."""

from __future__ import annotations

import subprocess
import sys
import tempfile
import textwrap


SCRIPT_LOAD = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", {wh!r}).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.types import Column, ColumnType
    e = Engine.from_config(json.dumps({{"connectionUri": {wh!r}}}), spark=spark)
    e.csv_create_sink().consume(
        '/restart"; DROP TABLE x; --',
        [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)],
        b"7,z\\r\\n8,y\\r\\n",
    )
    print("LOADED")
    spark.stop()
    """
)

SCRIPT_READ = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", {wh!r}).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from quasar_destination_h2_spark.engine import Engine
    e = Engine.from_config(json.dumps({{"connectionUri": {wh!r}}}), spark=spark)
    rows = sorted((float(r.k), r.v) for r in
                  e.table('restart"; DROP TABLE x; --').collect())
    assert rows == [(7.0, "z"), (8.0, "y")], rows
    # and the load path still works over the pre-existing warehouse
    from quasar_destination_h2_spark.types import Column, ColumnType
    e.csv_create_sink().consume(
        '/restart"; DROP TABLE x; --',
        [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)],
        b"1,a\\r\\n",
    )
    assert e.table('restart"; DROP TABLE x; --').count() == 1
    print("READBACK-OK")
    spark.stop()
    """
)


SCRIPT_DML = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", {wh!r}).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.types import Column, ColumnType
    e = Engine.from_config(json.dumps({{"connectionUri": {wh!r}}}), spark=spark)
    name = 'restart"; DROP TABLE x; --'
    cols = [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)]
    # DML against a table THIS process never created: the session
    # catalog has never heard of it, only the warehouse has.
    n = e.insert_into(name, cols, b"9,w\\r\\n")
    assert n == 1, n
    assert e.table(name).count() == 3
    m = e.update_where(name, {{"v": "'Z'"}}, "k = 7")
    assert m == 1, m
    d = e.delete_where(name, "k = 8")
    assert d == 1, d
    rows = sorted((float(r.k), r.v) for r in e.table(name).collect())
    assert rows == [(7.0, "Z"), (9.0, "w")], rows
    print("DML-OK")
    spark.stop()
    """
)


def _run(script: str) -> str:
    p = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return p.stdout


def test_table_survives_process_restart():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = tempfile.mkdtemp(prefix="restart-wh-")
    out1 = _run(SCRIPT_LOAD.format(repo=repo, wh=wh))
    assert "LOADED" in out1
    out2 = _run(SCRIPT_READ.format(repo=repo, wh=wh))
    assert "READBACK-OK" in out2


def test_dml_survives_process_restart():
    """INSERT/UPDATE/DELETE in a FRESH process against a table a
    previous engine materialized: append/overwrite saveAsTable must
    not take the create-table path (LOCATION_ALREADY_EXISTS) — the
    engine re-registers the warehouse directory first."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = tempfile.mkdtemp(prefix="restart-dml-wh-")
    out1 = _run(SCRIPT_LOAD.format(repo=repo, wh=wh))
    assert "LOADED" in out1
    out2 = _run(SCRIPT_DML.format(repo=repo, wh=wh))
    assert "DML-OK" in out2


SCRIPT_ADDCOL_A = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", {wh!r}).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from quasar_destination_h2_spark.engine import Engine
    e = Engine.from_config(json.dumps({{"connectionUri": {wh!r}}}), spark=spark)
    e.execute_sql('CREATE CACHED TABLE "rs_mo"("a" INT)')
    e.execute_sql("INSERT INTO rs_mo VALUES (1), (2)")
    e.execute_sql('ALTER TABLE rs_mo ADD COLUMN "b" BIGINT')
    print("ADDED")
    spark.stop()
    """
)


SCRIPT_ADDCOL_B = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", {wh!r}).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from quasar_destination_h2_spark.engine import Engine
    e = Engine.from_config(json.dumps({{"connectionUri": {wh!r}}}), spark=spark)
    # the files never carried column b (metadata-only add) — a fresh
    # process must still see the declared schema, read NULLs, and
    # write through it
    assert e.table("rs_mo").columns == ["a", "b"], e.table("rs_mo").columns
    got = {{(r.a, r.b) for r in e.execute_sql("SELECT * FROM rs_mo").collect()}}
    assert got == {{(1, None), (2, None)}}, got
    e.execute_sql("INSERT INTO rs_mo VALUES (3, 30)")
    got = {{(r.a, r.b) for r in e.execute_sql("SELECT * FROM rs_mo").collect()}}
    assert got == {{(1, None), (2, None), (3, 30)}}, got
    print("ADDCOL-OK")
    spark.stop()
    """
)


def test_metadata_only_add_column_survives_restart():
    """A metadata-only ADD COLUMN (colmeta 'added_type') must survive
    a process restart: footer inference never sees the column, so
    _ensure_registered re-applies the declared type."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = tempfile.mkdtemp(prefix="restart-wh-")
    out1 = _run(SCRIPT_ADDCOL_A.format(repo=repo, wh=wh))
    assert "ADDED" in out1
    out2 = _run(SCRIPT_ADDCOL_B.format(repo=repo, wh=wh))
    assert "ADDCOL-OK" in out2
