"""Engine lifecycle tests — init errors, probe validation, init
script, CSV export parity (H2DestinationModule.scala:59-107,
H2Server.scala:41-58, CsvSupport.scala:42-51)."""

import glob
import os

import pytest

from quasar_destination_h2_spark import Engine, MalformedConfiguration
from quasar_destination_h2_spark.config import InitConfig
from quasar_destination_h2_spark.server import run_init_script, split_sql_script
from quasar_destination_h2_spark.sources.csv_format import write_csv


def test_malformed_config_raises(spark):
    with pytest.raises(MalformedConfiguration):
        Engine.from_config({"nope": 1}, spark=spark)


def test_engine_tag_and_probe(engine):
    assert len(engine.tag) == 6 and engine.tag.isalnum()
    assert engine.sql("SELECT 1").collect()[0][0] == 1


def test_split_sql_script():
    stmts = split_sql_script(
        "CREATE TABLE a(x INT); INSERT INTO a VALUES (1); "
        "SELECT 'semi;colon' ; "
    )
    assert len(stmts) == 3
    assert stmts[2] == "SELECT 'semi;colon'"


def test_init_script_runs_and_is_idempotent(spark, engine):
    init = InitConfig(
        url="",
        user="",
        password="",
        script=(
            "CREATE TABLE init_seed AS SELECT 1 AS x; "
            "INSERT INTO init_seed VALUES (2)"
        ),
    )
    assert run_init_script(spark, init) is True
    # second run fails (table exists) but is swallowed — parity with
    # the reference's catch-as-already-initialized (H2Server.scala:53-57)
    assert run_init_script(spark, init) is False
    assert spark.table("init_seed").count() == 2


def test_csv_export_wire_format(spark, tmp_path):
    """Writer parity with Quasar's renderer: headerless, \r\n line
    ends, minimal quoting with doubled quotes."""
    df = spark.createDataFrame(
        [("plain", 1), ('needs "quote", comma', 2), (None, 3)],
        ["s", "n"],
    )
    out = str(tmp_path / "export")
    write_csv(df.coalesce(1), out)
    data = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(os.path.join(out, "part-*")))
    )
    text = data.decode("utf-8")
    assert "\r\n" in text
    lines = sorted(text.strip("\r\n").split("\r\n"))
    assert 'needs ""quote"", comma' in "".join(lines)  # doubled quotes
    assert any(line == ",3" for line in lines)  # NULL -> empty field
