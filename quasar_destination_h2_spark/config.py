"""Engine configuration: JSON decode + log sanitization.

Mirrors the reference's config model and redaction discipline:

* ``Config(connectionUri, server?)`` decoded from JSON
  (``Config.scala:25-43``, README.md:13-31).
* Sanitization redacts everything after the first ``;`` in the
  connection URI (H2 URIs carry credentials/params there,
  ``Config.scala:27-34``) and the ``password`` + ``script`` of the
  init section (``server/ServerConfig.scala:30``), using the literal
  ``<REDACTED>`` (``package.scala:33``).
* A config that fails to decode raises ``MalformedConfiguration``
  carrying a fully-redacted copy (``H2DestinationModule.scala:65-73``).

Spark adaptation: ``connectionUri`` becomes the warehouse location
(where ``saveAsTable`` materializes tables); the optional ``server``
section keeps the reference's three subsections (``init``/``tcp``/
``pg``) with ``tcp``/``pg`` mapping onto Spark Connect / Thrift
JDBC server passthrough args.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

from .errors import MalformedConfiguration

REDACTED = "<REDACTED>"  # package.scala:33


@dataclass(frozen=True)
class InitConfig:
    """server.init — one-shot SQL init script (ServerConfig.scala:24-33)."""

    url: str
    user: str
    password: str
    script: str


@dataclass(frozen=True)
class ServerConfig:
    """Optional embedded-server section (ServerConfig.scala:36-57)."""

    init: Optional[InitConfig] = None
    tcp_args: Optional[list[str]] = None
    pg_args: Optional[list[str]] = None


@dataclass(frozen=True)
class Config:
    """Engine config (Config.scala:25-43)."""

    connection_uri: str
    server: Optional[ServerConfig] = None
    spark_conf: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def from_json(raw: "str | bytes | dict[str, Any]") -> "Config":
        """Decode a config; raise MalformedConfiguration (with the
        redacted config) on any shape error."""
        try:
            obj = json.loads(raw) if isinstance(raw, (str, bytes)) else raw
        except (json.JSONDecodeError, TypeError) as e:
            raise MalformedConfiguration(REDACTED, f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise MalformedConfiguration(REDACTED, "config must be an object")
        try:
            uri = obj["connectionUri"]
            if not isinstance(uri, str):
                raise TypeError("connectionUri must be a string")
            server = None
            if "server" in obj and obj["server"] is not None:
                s = obj["server"]
                init = None
                if s.get("init") is not None:
                    i = s["init"]
                    init = InitConfig(
                        url=str(i["url"]),
                        user=str(i.get("user", "")),
                        password=str(i.get("password", "")),
                        script=str(i["script"]),
                    )
                server = ServerConfig(
                    init=init,
                    tcp_args=list(s["tcp"]) if s.get("tcp") is not None else None,
                    pg_args=list(s["pg"]) if s.get("pg") is not None else None,
                )
            conf = obj.get("sparkConf") or {}
            if not isinstance(conf, dict):
                raise TypeError("sparkConf must be an object")
            return Config(uri, server, {str(k): str(v) for k, v in conf.items()})
        except (KeyError, TypeError, ValueError, AttributeError) as e:
            # Reference redacts the WHOLE config on decode failure
            # (H2DestinationModule.scala:65-73).
            raise MalformedConfiguration(
                sanitize_unparsed(obj), f"missing/invalid field: {e}"
            ) from e

    def sanitized(self) -> dict[str, Any]:
        """Loggable copy — mirrors Config.sanitize (Config.scala:27-37)."""
        out: dict[str, Any] = {"connectionUri": _redact_uri(self.connection_uri)}
        if self.server is not None:
            s: dict[str, Any] = {}
            if self.server.init is not None:
                s["init"] = {
                    "url": self.server.init.url,
                    "user": self.server.init.user,
                    "password": REDACTED,  # ServerConfig.scala:30
                    "script": REDACTED,
                }
            if self.server.tcp_args is not None:
                s["tcp"] = list(self.server.tcp_args)
            if self.server.pg_args is not None:
                s["pg"] = list(self.server.pg_args)
            out["server"] = s
        if self.spark_conf:
            out["sparkConf"] = dict(self.spark_conf)
        return out


def _redact_uri(uri: str) -> str:
    """Everything after the first ';' is params (may hold credentials)
    — replace with <REDACTED> (Config.scala:27-34)."""
    head, sep, _ = uri.partition(";")
    return head + (";" + REDACTED if sep else "")


def sanitize_unparsed(obj: Any) -> Any:
    """Best-effort redaction of a config that failed to decode: keep
    the shape, redact every leaf value."""
    if isinstance(obj, dict):
        return {k: sanitize_unparsed(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [sanitize_unparsed(v) for v in obj]
    return REDACTED
