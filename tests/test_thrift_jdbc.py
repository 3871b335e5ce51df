"""External-client round-trip over the Thrift JDBC endpoint: the
reference's whole point is that loaded tables are queryable by
outside clients over the wire (H2Server.scala:60-84). Here beeline
(the stock HiveServer2 JDBC CLI shipped with Spark) connects to the
engine's endpoint and SELECTs a table the sink loaded."""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.types import Column, ColumnType

BEELINE = shutil.which("beeline") or "/opt/spark/bin/beeline"
PORT = 10337


@pytest.mark.skipif(
    not shutil.which("beeline") and not shutil.which(BEELINE),
    reason="beeline not available",
)
def test_external_jdbc_client_query(spark, warehouse_dir):
    cfg = json.dumps(
        {
            "connectionUri": warehouse_dir,
            "server": {"pg": ["-pgPort", str(PORT)]},
        }
    )
    engine = Engine.from_config(cfg, spark=spark)
    assert engine.endpoint_started
    # The Thrift server is a JVM-wide singleton: if an earlier test
    # already started it, this engine joins it and the effective port
    # differs from the requested one — connect to the effective port.
    port = engine.endpoint_port or str(PORT)
    try:
        engine.csv_create_sink().consume(
            "/wire_t",
            [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)],
            b"1,alpha\r\n2,beta\r\n",
        )
        physical = engine.sink.catalog["wire_t"]
        p = subprocess.run(
            [
                BEELINE,
                "-u",
                f"jdbc:hive2://localhost:{port}",
                "-n",
                "test",
                "--silent=true",
                "--outputformat=csv2",
                "-e",
                f"SELECT k, v FROM {physical} ORDER BY k",
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        lines = [l for l in p.stdout.splitlines() if l.strip()]
        # csv2: header + rows
        assert any("alpha" in l for l in lines), p.stdout
        assert any("beta" in l for l in lines), p.stdout
    finally:
        engine.close()


@pytest.mark.skipif(
    not shutil.which("beeline") and not shutil.which(BEELINE),
    reason="beeline not available",
)
def test_external_jdbc_client_introspection(spark, warehouse_dir):
    """A wire client introspects the H2-spelled INFORMATION_SCHEMA
    through the shared Thrift session (r9 verdict task 1): the
    persistent literal-backed views resolve natively in beeline."""
    cfg = json.dumps(
        {
            "connectionUri": warehouse_dir,
            "server": {"pg": ["-pgPort", str(PORT)]},
        }
    )
    engine = Engine.from_config(cfg, spark=spark)
    assert engine.endpoint_started
    port = engine.endpoint_port or str(PORT)
    try:
        engine.csv_create_sink().consume(
            "/wire_is",
            [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)],
            b"1,alpha\r\n",
        )
        # no explicit refresh: the serving engine republishes the
        # views on every catalog mutation (sink.on_catalog_change)
        p = subprocess.run(
            [
                BEELINE,
                "-u",
                f"jdbc:hive2://localhost:{port}",
                "-n",
                "test",
                "--silent=true",
                "--outputformat=csv2",
                "-e",
                "SELECT c.COLUMN_NAME, c.TYPE_NAME "
                "FROM INFORMATION_SCHEMA.COLUMNS c "
                "JOIN INFORMATION_SCHEMA.TABLES t "
                "  ON t.TABLE_NAME = c.TABLE_NAME "
                "WHERE t.TABLE_NAME = 'wire_is' "
                "ORDER BY c.ORDINAL_POSITION",
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        lines = [l for l in p.stdout.splitlines() if l.strip()]
        assert any("k,DECIMAL" in l for l in lines), p.stdout
        assert any("v,VARCHAR" in l for l in lines), p.stdout
    finally:
        engine.close()
