"""Identifier hygiene — SQL-injection defense for table/column names.

The reference wraps every identifier in double quotes and doubles any
embedded quote (``hygienicIdent``, ``package.scala:42-43``), applied to
the table name and every column name before they reach SQL text
(``H2CsvCreateSink.scala:83,112,126``). Required behavior is pinned by
the injection tests (``H2DestinationSpec.scala:176-207``): hostile
names like ``foobar; drop table really_important; ...`` must be
treated as opaque identifiers, never executed.

Spark SQL quotes identifiers with backticks, doubling embedded
backticks — same scheme, different quote char. We also keep the
ANSI/H2 double-quote variant for generated ANSI SQL (e.g. oracle
export paths).
"""

from __future__ import annotations

import re


def hygienic_ident(ident: str) -> str:
    """Backtick-quote an identifier for Spark SQL.

    Mirrors ``package.scala:42-43`` with Spark's quote char:
    ``x`` -> ```x``` and embedded backticks are doubled.
    """
    return "`" + ident.replace("`", "``") + "`"


def hygienic_ident_ansi(ident: str) -> str:
    """Double-quote an identifier for ANSI SQL — the reference's exact
    scheme (``package.scala:42-43``)."""
    return '"' + ident.replace('"', '""') + '"'


_SAFE_STORAGE = re.compile(r"[^0-9a-zA-Z_]")


def storage_safe_name(ident: str) -> str:
    """A filesystem/catalog-safe physical name for a logical table name.

    Spark's built-in catalogs reject many characters in *physical*
    table identifiers (the warehouse directory is named after the
    table). The engine therefore stores hostile logical names under a
    sanitized physical name suffixed with a stable fingerprint, and
    keeps the logical->physical mapping in its own catalog map. The
    *logical* name remains fully opaque data — nothing from it is ever
    interpolated into SQL unquoted (injection tests F5 pin this).
    """
    import hashlib

    safe = _SAFE_STORAGE.sub("_", ident)[:64].strip("_") or "t"
    fp = hashlib.sha256(ident.encode("utf-8")).hexdigest()[:10]
    return f"{safe}_{fp}".lower()
