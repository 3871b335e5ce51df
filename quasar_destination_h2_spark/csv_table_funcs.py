"""H2 ``CSVREAD`` / ``CSVWRITE`` table functions at the statement surface.

H2 1.4.200 — the SQL engine the reference embeds and delegates its
entire query surface to (``/root/reference/build.sbt:51``,
``/root/reference/core/src/main/scala/quasar/destination/h2/server/H2Server.scala:60-84``)
— exposes CSV as first-class SQL:

* ``SELECT * FROM CSVREAD('file'[, columnsString[, options]])`` scans a
  CSV file as a table of VARCHAR columns;
* ``CALL CSVWRITE('file', 'query'[, options])`` runs a query and
  exports it as one CSV file, returning the written row count.

A reference user at the wire uses both constantly (the destination's
own spec loads its sink output back with
``CSVREAD(..., 'charset=UTF-8')`` — ``H2DestinationSpec.scala:253``),
so this module re-expresses them Spark-first:

* ``CSVREAD`` is a REWRITE, not an eager load: each call site becomes a
  temp view backed by ``spark.read.csv`` with H2's reader semantics
  (every column VARCHAR, no inference). The scan is lazy, splittable
  and distributed — filters/projections over the view push into the
  file scan via Catalyst, so ``SELECT c FROM CSVREAD(f) WHERE k='x'``
  reads one column with a pushed filter at any scale, where H2 itself
  would stream the whole file single-threaded.
* ``CSVWRITE`` materializes through Spark's JVM CSV encoder into a
  single file (H2 writes ONE file; we ``coalesce(1)`` the final write
  only — upstream computation keeps its parallelism).

H2 semantics replicated (all public-doc behavior):

* columnsString NULL/omitted → first line is the header; names are
  UPPERCASED unless ``caseSensitiveColumnNames=true`` (H2's
  ``Csv.setCaseSensitiveColumnNames``). columnsString given → it is
  itself parsed as one CSV line of names and the first file line is
  DATA.
* The options string is space-separated ``key=value`` pairs
  (``'charset=UTF-8 fieldSeparator=|'``); a string with no ``=`` is
  the charset (H2's legacy form). Unknown keys error loudly.
* ``null`` (default empty): the string that reads/writes as SQL NULL.
  With the default, an unquoted empty field loads as NULL and NULL is
  written as an empty field, quoted empty survives as '' — both
  directions match Spark's null/emptyValue split.
* ``preserveWhitespace`` (default false): unquoted text is trimmed.
* ``writeColumnHeader`` (default true): CSVWRITE emits a header row.

Documented divergences (each pinned by a test): TIMESTAMP columns are
written as ``yyyy-MM-dd HH:mm:ss.SSS`` (H2 omits an all-zero
fraction); ``lineComment`` applies to reads only (H2 also allows it on
write); multi-character fieldSeparator is rejected (H2 accepts it for
write only).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile
from typing import Optional

from pyspark.sql import DataFrame

from .sql_dml import _match_close, _split_top_level

#: CSVWRITE statement head — ``CALL CSVWRITE(...)`` (H2 also accepts a
#: bare expression call; both spellings land here).
CSVWRITE_RE = re.compile(r"\s*(?:CALL\s+)?CSVWRITE\s*\(", re.I)

#: CSVREAD call-site detector (pre-filter on the shadow, so CSVREAD
#: inside a string literal never triggers a rewrite).
CSVREAD_RE = re.compile(r"\bCSVREAD\s*\(", re.I)

#: ``CALL <expr>`` — H2 evaluates any expression; maps to SELECT.
CALL_RE = re.compile(r"\s*CALL\b", re.I)

#: The full H2 1.4.200 option-key surface (Csv setters); write_only
#: keys are accepted-and-ignored on read, read_only keys on write.
_OPTION_KEYS = frozenset(
    {
        "casesensitivecolumnnames",
        "charset",
        "escape",
        "fielddelimiter",
        "fieldseparator",
        "linecomment",
        "lineseparator",
        "null",
        "preservewhitespace",
        "writecolumnheader",
    }
)


def _parse_literal_arg(arg: str) -> Optional[str]:
    """One CSVREAD/CSVWRITE argument: a '...' literal (with ''
    escapes) or NULL. Anything else (identifiers, expressions) is a
    loud error — these are file paths and option strings, and
    splicing computed SQL into them would be an injection surface."""
    a = arg.strip()
    if re.fullmatch(r"NULL", a, re.I):
        return None
    if len(a) >= 2 and a[0] == "'" and a[-1] == "'":
        body = a[1:-1]
        # reject 'a' || x style: an interior unescaped quote means
        # the trimmed span is not ONE literal
        if re.search(r"'(?!')", body.replace("''", "")):
            raise ValueError(f"CSVREAD/CSVWRITE argument is not a single string literal: {arg!r}")
        return body.replace("''", "'")
    raise ValueError(
        "CSVREAD/CSVWRITE arguments must be string literals or NULL "
        f"(got {arg.strip()!r}); computed arguments are not supported"
    )


def parse_csv_options(options: Optional[str]) -> dict[str, str]:
    """H2 option string -> normalized {lowercase key: value} dict.

    H2's two public forms: space-separated ``key=value`` pairs, or a
    bare charset name (no ``=``). Unknown keys and unparseable residue
    raise — silently ignoring an option the user typed (e.g. a typo'd
    ``fieldSeperator``) would be silent data divergence."""
    if options is None or not options.strip():
        return {}
    text = options.strip()
    if "=" not in text:
        return {"charset": text}
    out: dict[str, str] = {}
    pos = 0
    for m in re.finditer(r"(\w+)=(\S*)", text):
        if text[pos : m.start()].strip():
            raise ValueError(
                f"unparseable CSV option text {text[pos:m.start()].strip()!r} in {options!r}"
            )
        key = m.group(1).lower()
        if key not in _OPTION_KEYS:
            raise ValueError(f"unknown CSV option {m.group(1)!r} in {options!r}")
        out[key] = m.group(2)
        pos = m.end()
    if text[pos:].strip():
        raise ValueError(f"unparseable CSV option text {text[pos:].strip()!r} in {options!r}")
    return out


def _sep_char(opts: dict[str, str], key: str, default: str) -> str:
    v = opts.get(key, default)
    if len(v) != 1:
        raise ValueError(f"CSV option {key} must be a single character (got {v!r})")
    return v


def _reader_options(opts: dict[str, str]) -> dict[str, str]:
    """H2 read semantics -> Spark DataFrameReader CSV options."""
    preserve = opts.get("preservewhitespace", "false").lower() == "true"
    ropts = {
        "sep": _sep_char(opts, "fieldseparator", ","),
        "quote": _sep_char(opts, "fielddelimiter", '"'),
        "escape": _sep_char(opts, "escape", '"'),
        "encoding": opts.get("charset", "UTF-8"),
        # H2 null option: the token that loads as SQL NULL (default
        # empty → unquoted empty field is NULL, quoted "" is '')
        "nullValue": opts.get("null", ""),
        "emptyValue": "",
        "inferSchema": "false",  # H2: every CSVREAD column is VARCHAR
        "ignoreLeadingWhiteSpace": str(not preserve).lower(),
        "ignoreTrailingWhiteSpace": str(not preserve).lower(),
        "mode": "PERMISSIVE",
    }
    if "linecomment" in opts:
        ropts["comment"] = _sep_char(opts, "linecomment", "#")
    # lineSeparator: Spark's reader recognizes \n, \r and \r\n
    # natively; an explicit exotic separator is the only case we map
    if "lineseparator" in opts and opts["lineseparator"] not in (
        r"\n",
        r"\r\n",
        r"\r",
    ):
        ropts["lineSep"] = opts["lineseparator"]
    return ropts


def _split_names(columns: str, sep: str) -> list[str]:
    """columnsString is parsed as one CSV line of column names (H2
    feeds it through the same Csv tokenizer as a data line)."""
    names = [n.strip().strip('"') for n in columns.split(sep)]
    names = [n for n in names if n]
    if not names:
        raise ValueError(f"CSVREAD columnsString parsed to zero names: {columns!r}")
    return names


def csvread_dataframe(
    engine, path: str, columns: Optional[str], options: Optional[str]
) -> DataFrame:
    """The table a CSVREAD call site denotes — a lazy, splittable
    all-VARCHAR scan with H2's header/naming rules applied."""
    opts = parse_csv_options(options)
    ropts = _reader_options(opts)
    case_sensitive = opts.get("casesensitivecolumnnames", "false").lower() == "true"
    if columns is None:
        df = engine.spark.read.options(header="true", **ropts).csv(path)
    else:
        names = _split_names(columns, ropts["sep"])
        df = engine.spark.read.options(header="false", **ropts).csv(path)
        if len(df.columns) != len(names):
            raise ValueError(
                f"CSVREAD columnsString names {len(names)} columns but the "
                f"file has {len(df.columns)}"
            )
        df = df.toDF(*names)
    if not case_sensitive:
        df = df.toDF(*[c.upper() for c in df.columns])
    return df


def rewrite_csvread(engine, sql: str, shadow: str) -> str:
    """Replace every ``CSVREAD(...)`` call site with a registered temp
    view name, so the statement (SELECT source, INSERT source, a
    subquery — any position) parses as plain Spark SQL against a lazy
    CSV scan. Right-to-left so earlier spans stay valid."""
    sites = list(CSVREAD_RE.finditer(shadow))
    for m in reversed(sites):
        open_pos = shadow.index("(", m.start())
        close = _match_close(shadow, open_pos)
        args = _split_top_level(sql, shadow, open_pos + 1, close)
        if not 1 <= len(args) <= 3:
            raise ValueError(
                f"CSVREAD takes 1-3 arguments, got {len(args)}: {sql[m.start():close + 1]!r}"
            )
        lits = [_parse_literal_arg(a) for a in args]
        path = lits[0]
        if path is None:
            raise ValueError("CSVREAD file name must not be NULL")
        columns = lits[1] if len(lits) > 1 else None
        options = lits[2] if len(lits) > 2 else None
        # deterministic per-argument view name: same call site ->
        # same view; cheap to re-register (the reader is lazy)
        key = hashlib.md5(repr((path, columns, options)).encode()).hexdigest()[:12]
        view = f"csvread_{key}"
        csvread_dataframe(engine, path, columns, options).createOrReplaceTempView(view)
        sql = sql[: m.start()] + view + sql[close + 1 :]
    return sql


def _writer_options(opts: dict[str, str]) -> dict[str, str]:
    """H2 write semantics -> Spark DataFrameWriter CSV options."""
    header = opts.get("writecolumnheader", "true").lower() != "false"
    return {
        "header": str(header).lower(),
        "sep": _sep_char(opts, "fieldseparator", ","),
        "quote": _sep_char(opts, "fielddelimiter", '"'),
        "escape": _sep_char(opts, "escape", '"'),
        "encoding": opts.get("charset", "UTF-8"),
        "nullValue": opts.get("null", ""),
        "emptyValue": '""',  # '' survives as a quoted empty field
        "quoteAll": "false",
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
        "lineSep": {r"\n": "\n", r"\r\n": "\r\n", r"\r": "\r"}.get(
            opts.get("lineseparator", r"\n"), opts.get("lineseparator", "\n")
        ),
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSS",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSS",
        "dateFormat": "yyyy-MM-dd",
    }


def execute_csvwrite(engine, sql: str, shadow: str) -> int:
    """``CALL CSVWRITE('file', 'query'[, options])`` — run the query
    through the full statement surface (it may use H2 grammar,
    sequences, even CSVREAD) and export ONE CSV file, returning the
    row count like H2's int result.

    Scale shape: the query executes with full parallelism; only the
    final encode is ``coalesce(1)`` (a one-file export is the
    operation's contract, as in H2). The count comes from the same
    persisted frame, so the query computes once."""
    m = CSVWRITE_RE.match(shadow)
    open_pos = shadow.index("(", m.start())
    close = _match_close(shadow, open_pos)
    if shadow[close + 1 :].strip():
        raise ValueError("unexpected text after CSVWRITE(...)")
    args = _split_top_level(sql, shadow, open_pos + 1, close)
    if not 2 <= len(args) <= 3:
        raise ValueError(f"CSVWRITE takes 2-3 arguments, got {len(args)}")
    lits = [_parse_literal_arg(a) for a in args]
    path, query = lits[0], lits[1]
    if path is None or query is None:
        raise ValueError("CSVWRITE file name and query must not be NULL")
    opts = parse_csv_options(lits[2] if len(lits) > 2 else None)
    wopts = _writer_options(opts)
    df = engine.execute_sql(query)
    if not isinstance(df, DataFrame):
        raise ValueError(f"CSVWRITE query must be a SELECT, got {query!r}")
    if opts.get("casesensitivecolumnnames", "false").lower() != "true":
        # H2 writes the header with its (uppercased-unquoted) labels
        df = df.toDF(*[c.upper() for c in df.columns])
    df = df.persist()
    try:
        n = df.count()
        staging = tempfile.mkdtemp(prefix="csvwrite_", dir=os.path.dirname(path) or None)
        try:
            df.coalesce(1).write.mode("overwrite").options(**wopts).csv(staging)
            part = next(
                f for f in sorted(os.listdir(staging)) if f.startswith("part-")
            )
            os.replace(os.path.join(staging, part), path)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    finally:
        df.unpersist()
    return n
