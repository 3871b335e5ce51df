"""Config-driven cluster profile: the destination config's
``sparkConf`` must override DEFAULT_SPARK_CONF when the engine boots
its own session — so the local[32] tuning (shuffle.partitions=32
etc.) never leaks into a real cluster deployment, where the operator
sets partitions/memory in the config. Needs a fresh JVM (builder
configs are ignored on an already-active session — the engine warns
in that case), hence the subprocess."""

from __future__ import annotations

import subprocess
import sys
import tempfile
import textwrap


SCRIPT = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from quasar_destination_h2_spark.engine import Engine

    cfg = {{"connectionUri": {wh!r},
           "sparkConf": {{"spark.sql.shuffle.partitions": "123",
                          "spark.sql.adaptive.skewJoin.enabled": "false"}}}}
    e = Engine.from_config(json.dumps(cfg))
    # overrides win over DEFAULT_SPARK_CONF...
    assert e.spark.conf.get("spark.sql.shuffle.partitions") == "123"
    assert e.spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "false"
    # ...defaults not overridden still apply...
    assert e.spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert e.spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # ...and the connection URI is the warehouse
    assert {wh!r} in e.spark.conf.get("spark.sql.warehouse.dir")
    print("PROFILE-OK")
    e.spark.stop()
    """
)


def test_spark_conf_overrides_defaults():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = tempfile.mkdtemp(prefix="profile-wh-")
    p = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo, wh=wh)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "PROFILE-OK" in p.stdout
