"""H2 SCRIPT / RUNSCRIPT / EXPLAIN at the statement surface.

H2 1.4.200 grammar the reference's users reach through its socket
(`H2Server.scala:60-84`) — and the reference itself boots through
``h2.RunScript.execute`` (`H2Server.scala:51`), so script execution
is literally the first statement surface it touches:

* ``SCRIPT NODATA [TO 'file']`` — one row per DDL statement
  re-creating the engine catalog (sequences first, then tables, both
  name-sorted; H2 type spellings, ``NOT NULL`` carried), column name
  ``SCRIPT`` like H2's. A data-ful ``SCRIPT`` (without NODATA)
  raises: a 100 TB corpus rendered as driver-side INSERT literals is
  an anti-pattern — ``CALL CSVWRITE`` / parquet are the data paths.
* ``RUNSCRIPT FROM 'file' [CHARSET 'utf-8']`` — execute the file's
  statements through the FULL ``execute_sql`` surface (each one gets
  the same dialect rewrites and catalog-aware dispatch), so a
  ``SCRIPT NODATA`` dump restores on a fresh warehouse.
* ``EXPLAIN [ANALYZE] [PLAN FOR] <query>`` — H2's one-row plan
  result (column ``PLAN``), carrying Spark's FORMATTED plan text:
  honest about what actually executes here rather than imitating
  H2's SQL-ish rendering. ANALYZE executes the query first and
  explains the final (AQE-resolved) plan. Only query statements are
  explainable: DML on this surface executes as catalog-rewrites, so
  "explaining" one without running it has no single plan — the error
  says so. Statements containing sequence value functions are
  rejected (NEXTVAL substitution allocates; H2's EXPLAIN does not).

The generated DDL spells tables ``CREATE CACHED TABLE`` exactly like
H2's SCRIPT output; ``sql_dml`` dispatches that spelling into the
ENGINE catalog (empty table with the declared schema), which is what
makes the dump→restore round trip land back where it started.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

    from .engine import Engine

SCRIPT_RE = re.compile(r"\s*SCRIPT\b", re.I)
RUNSCRIPT_RE = re.compile(r"\s*RUNSCRIPT\b", re.I)
EXPLAIN_RE = re.compile(
    r"\s*EXPLAIN\s+(?P<analyze>ANALYZE\s+)?(?:PLAN\s+(?:FOR\s+)?)?", re.I
)

_SEQ_FUNC_RE = re.compile(
    r"\b(?:NEXTVAL|CURRVAL)\s*\(|\bNEXT\s+VALUE\s+FOR\b", re.I
)


def _h2_column_type(field) -> str:
    """H2-1.4.200 SCRIPT spelling for one Spark field's type. Complex
    types raise: H2 1.4.200's own SCRIPT cannot round-trip a TYPED
    array either (its ARRAY is untyped), and silently dropping the
    element type would corrupt a restore — index/vector tables dump
    via parquet, not SQL scripts."""
    from .info_schema import h2_type_info

    simple = field.dataType.simpleString()
    if simple.startswith(("array", "map", "struct")):
        raise ValueError(
            f"SCRIPT: column {field.name!r} has type {simple!r}, which "
            "H2 1.4.200 DDL cannot express faithfully — export such "
            "tables as parquet (or CALL CSVWRITE for scalar "
            "projections) instead"
        )
    if simple == "timestamp":
        # H2 1.4.200: TIMESTAMP is the wall-clock type; the instant
        # type is spelled out — round-tripping the distinction is
        # what lets RUNSCRIPT restore the exact Spark schema
        return "TIMESTAMP WITH TIME ZONE"
    tname, _code, _cmax, prec, scale = h2_type_info(field.dataType)
    if tname == "DECIMAL":
        return f"DECIMAL({prec},{scale})"
    m = re.match(r"(?:varchar|char)\((\d+)\)", simple)
    if m:
        return f"VARCHAR({m.group(1)})"
    return tname


def _spark_expr_to_h2(expr: str) -> str:
    """Backtick-quoted identifiers -> H2 double-quoted form (the
    inverse of sql_dml._h2_expr_to_spark, for SCRIPT dumps a real H2
    must be able to load). Single-quoted literals pass through."""
    out, i, n = [], 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if expr[j] == "'":
                    if j + 1 < n and expr[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(expr[i : j + 1])
            i = j + 1
        elif ch == "`":
            j = i + 1
            ident = []
            while j < n:
                if expr[j] == "`":
                    if j + 1 < n and expr[j + 1] == "`":
                        ident.append("`")
                        j += 2
                        continue
                    break
                ident.append(expr[j])
                j += 1
            out.append('"' + "".join(ident).replace('"', '""') + '"')
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def script_lines(
    engine: "Engine", only_tables: list[str] | None = None
) -> list[str]:
    """The NODATA script: CREATE SEQUENCE statements (name-sorted,
    current position carried via START WITH = the next value the
    restored sequence dispenses), then CREATE CACHED TABLE statements
    (name-sorted, H2 type spellings, NOT NULL carried). With
    ``only_tables`` (H2's ``SCRIPT ... TABLE t1, t2`` scoping) only
    those tables are emitted and — like H2 — sequences are omitted.
    Driver-only work bounded by catalog size — the same footprint as
    INFORMATION_SCHEMA refresh."""
    from .idents import hygienic_ident_ansi as q
    from .schemas import split_logical

    known_sch = engine.schemas.keys()

    def qn(logical) -> str:
        """H2-style fully-qualified spelling of a logical name: a
        schema object dumps as "SCHEMA"."NAME" (r14 — multi-schema
        dumps), a PUBLIC object keeps its bare quoted spelling
        (byte-stable with pre-r14 dumps)."""
        skey, bare = split_logical(str(logical), known_sch)
        if skey == "public":
            return q(str(logical))
        try:
            disp = engine.schemas.display(skey)
        except Exception:  # concurrent drop: key spelling still loads
            disp = skey.upper()
        return f"{q(disp)}.{q(bare)}"

    lines: list[str] = []
    comment_lines: list[str] = []  # COMMENT ON lines emit LAST
    all_meta = engine.colmeta.all()

    def _seq_lines(name: str) -> list[str]:
        s = engine.sequences.describe(name)
        # an EXHAUSTED sequence's next value sits past its bound
        # (and a RESTARTed one may sit below it) — CREATE rejects
        # an out-of-range START WITH, so clamp the CREATE into
        # bounds and carry the true position via ALTER ... RESTART
        # WITH (which, like H2's, is unchecked: MINVALUE is a
        # cycle restart point, not a floor). The restored sequence
        # then dispenses — or re-raises exhaustion — exactly where
        # the dumped one would.
        start = min(max(s["next"], s["min"]), s["max"])
        ddl = f"CREATE SEQUENCE {qn(name)} START WITH {start}"
        if s["inc"] != 1:
            ddl += f' INCREMENT BY {s["inc"]}'
        ddl += f' MINVALUE {s["min"]} MAXVALUE {s["max"]}'
        if s["cycle"]:
            ddl += " CYCLE"
        if s["cache"] is not None:
            ddl += f' CACHE {s["cache"]}'
        if s["belongs_to_table"]:
            # H2's own flag on identity-backing sequences: the
            # restored sequence dies with its table again
            ddl += " BELONGS_TO_TABLE"
        out = [ddl + ";"]
        if start != s["next"]:
            out.append(
                f'ALTER SEQUENCE {qn(name)} RESTART WITH {s["next"]};'
            )
        if s.get("remarks") is not None:
            comment_lines.append(
                f"COMMENT ON SEQUENCE {qn(name)} IS "
                f"'{s['remarks'].replace(chr(39), chr(39) * 2)}';"
            )
        return out

    if only_tables is None:
        # registered schemas restore FIRST (every later qualified
        # statement needs them) — H2's own dump order
        for disp in engine.schemas.names():
            if disp.casefold() == "public":
                continue  # built in, H2 dumps no line for it
            lines.append(
                f'CREATE SCHEMA IF NOT EXISTS {q(disp)} '
                f'AUTHORIZATION "SA";'
            )
        for name in sorted(engine.sequences.names()):
            lines.extend(_seq_lines(name))
        names = sorted(engine.sink.catalog)
    else:
        by_cf = {str(k).casefold(): str(k) for k in engine.sink.catalog}
        names = []
        for t in only_tables:
            if t.casefold() not in by_cf:
                raise ValueError(f"SCRIPT: table not found: {t!r}")
            names.append(by_cf[t.casefold()])
        names.sort()
        scoped_schemas = []
        for logical in names:
            skey, _b = split_logical(logical, known_sch)
            if skey != "public" and skey not in scoped_schemas:
                scoped_schemas.append(skey)
        for skey in sorted(scoped_schemas):
            try:
                disp = engine.schemas.display(skey)
            except Exception:
                disp = skey.upper()
            lines.append(
                f'CREATE SCHEMA IF NOT EXISTS {q(disp)} '
                f'AUTHORIZATION "SA";'
            )
        # a scoped dump must still restore its identity columns —
        # their DEFAULT (NEXT VALUE FOR ...) validates the sequence
        # exists — so, unlike H2's bare TABLE scoping, sequences
        # BOUND to an in-scope column are emitted (the scoped-views
        # dependency-closure precedent: a documented extension
        # without which the dump is unrestorable)
        emitted_seqs: set = set()
        for logical in names:
            cmeta = all_meta.get(str(logical).casefold(), {}).get(
                "columns", {}
            )
            for fm in cmeta.values():
                seq = fm.get("sequence")
                if seq and seq.casefold() not in emitted_seqs:
                    emitted_seqs.add(seq.casefold())
                    lines.extend(_seq_lines(seq))
    # ONE registry snapshot for the whole dump (the
    # refresh_information_schema pattern): per-table for_table calls
    # would re-open and re-parse the JSON twice per table, and a
    # concurrent writer could slip between the two reads of one table
    all_cons = engine.constraints.all()
    fk_lines: list[str] = []

    def _esc(s: str) -> str:
        return s.replace("'", "''")

    scoped_cf = {n.casefold() for n in names}
    for logical in names:
        try:
            schema = engine.table(logical).schema
        except Exception:
            if only_tables is not None:
                raise
            continue  # stale catalog entry: introspection never fails
        tcons = all_cons.get(logical.casefold(), [])
        tmeta = all_meta.get(str(logical).casefold(), {})
        cmeta = tmeta.get("columns", {})
        # PK members spell NOT NULL like H2's own dumps: Spark's
        # file-based saveAsTable forces every column nullable, so the
        # constraint REGISTRY (not the stored schema) is the
        # authoritative carrier of the PK's NOT NULL intent; declared
        # NOT NULL / DEFAULT / identity / SELECTIVITY come from the
        # column-metadata registry the same way (colmeta.py) and are
        # re-spelled exactly like H2's own dump grammar
        pk_cols = {
            c.casefold()
            for e in tcons
            if e["type"] == "PRIMARY KEY"
            for c in e["columns"]
        }

        def _coldef(f) -> str:
            fm = cmeta.get(f.name.casefold(), {})
            parts = [f"{q(f.name)} {_h2_column_type(f)}"]
            if fm.get("sequence"):
                parts.append(
                    f"DEFAULT (NEXT VALUE FOR {qn(fm['sequence'])})"
                )
            elif fm.get("default"):
                parts.append(
                    f"DEFAULT {_spark_expr_to_h2(fm['default'])}"
                )
            if (
                not f.nullable
                or f.name.casefold() in pk_cols
                or fm.get("not_null")
            ):
                parts.append("NOT NULL")
            if fm.get("null_to_default"):
                parts.append("NULL_TO_DEFAULT")
            if fm.get("sequence"):
                parts.append(f"SEQUENCE {qn(fm['sequence'])}")
            if fm.get("selectivity") is not None:
                parts.append(f"SELECTIVITY {fm['selectivity']}")
            return " ".join(parts)

        cols = ", ".join(_coldef(f) for f in schema.fields)
        lines.append(f"CREATE CACHED TABLE {qn(logical)}({cols});")
        # remarks round-trip as H2's own COMMENT ON lines (emitted
        # after every object exists)
        # `is not None`, not truthiness: COMMENT '' is recordable
        # (the registry removes on None, keeps ''), so an empty
        # remark must round-trip through the dump too (advice r14)
        if tmeta.get("remarks") is not None:
            comment_lines.append(
                f"COMMENT ON TABLE {qn(logical)} IS "
                f"'{_esc(tmeta['remarks'])}';"
            )
        for f in schema.fields:
            fm = cmeta.get(f.name.casefold(), {})
            if fm.get("remarks") is not None:
                comment_lines.append(
                    f"COMMENT ON COLUMN {qn(logical)}.{q(f.name)} IS "
                    f"'{_esc(fm['remarks'])}';"
                )
        # recorded PK/UNIQUE/CHECK constraints round-trip as H2
        # SCRIPT spells them: ALTER ... ADD CONSTRAINT lines after
        # the table (CHECK predicates are stored in the Spark
        # expression dialect — backtick identifiers — and re-spelled
        # with H2 double quotes so a real H2 could load the dump)
        for e in tcons:
            if e["type"] == "FOREIGN KEY":
                # H2 emits referential constraints AFTER all tables
                # (a restore must create the referenced table first)
                # with its own dumps' trailing NOCHECK. A scoped dump
                # (our extension) emits an FK only when its
                # referenced table is also in scope — the line could
                # not restore otherwise.
                if e["ref_table"].casefold() not in scoped_cf and (
                    only_tables is not None
                ):
                    continue
                cq = ", ".join(q(c) for c in e["columns"])
                rq = ", ".join(q(c) for c in e["ref_columns"])
                body = (
                    f"FOREIGN KEY({cq}) REFERENCES "
                    f"{qn(e['ref_table'])}({rq})"
                )
                if e.get("delete_rule"):
                    body += f" ON DELETE {e['delete_rule']}"
                if e.get("update_rule"):
                    body += f" ON UPDATE {e['update_rule']}"
                fk_lines.append(
                    f"ALTER TABLE {qn(logical)} ADD CONSTRAINT "
                    f"{q(e['name'])} {body} NOCHECK;"
                )
                continue
            if e["type"] == "CHECK":
                body = f"CHECK({_spark_expr_to_h2(e['predicate'])})"
            else:
                cq = ", ".join(q(c) for c in e["columns"])
                body = f"{e['type']}({cq})"
            lines.append(
                f"ALTER TABLE {qn(logical)} ADD CONSTRAINT "
                f"{q(e['name'])} {body};"
            )
    lines.extend(fk_lines)
    # views LAST and spelled CREATE FORCE VIEW, exactly like H2's own
    # SCRIPT output: FORCE lets the dump load regardless of
    # view-over-view order, and the definition re-spells its
    # identifiers with double quotes so a real H2 could load it.
    # TABLE scoping: H2 emits only the named tables; this engine
    # ADDITIONALLY emits views whose dependency closure lies within
    # the scoped tables (+ already-included views) — a documented
    # extension: without it a scoped dump of a-table-and-its-views
    # is unrestorable, and scoped dumps are the only kind a warehouse
    # holding vector-typed (un-DDL-able) tables can produce at all.
    allv = engine.views.all()
    if only_tables is None:
        emit = list(allv)
    else:
        from .views import relation_names

        # ONE relation-position scan per view over the already-held
        # registry snapshot (the r13 dependents_of semantics): a view
        # is emitted into a scoped dump only when every RELATION its
        # definition reads is in scope — a name mentioned merely as a
        # column/alias no longer excludes it. The scan is intersected
        # with KNOWN names (catalog tables + registered views): a CTE
        # alias or an in-function FROM operand (``extract(YEAR FROM
        # hired)``) is a relation-position token but names no catalog
        # object, and treating it as an out-of-scope dependency would
        # silently drop the view from the dump (review r13)
        known = {str(k).casefold() for k in engine.sink.catalog} | set(
            allv
        )
        refs: dict = {}
        for key, e in allv.items():
            refs[key] = (
                relation_names(e["definition"]) & known
            ) - {key}
        scoped = {n.casefold() for n in names}
        emit_set: set = set()
        changed = True
        while changed:
            changed = False
            for key in allv:
                if key in emit_set:
                    continue
                if refs[key] <= scoped | emit_set:
                    emit_set.add(key)
                    changed = True
        emit = sorted(emit_set)
    for key in emit:
        e = allv[key]
        cols = (
            "(" + ", ".join(q(c) for c in e["columns"]) + ")"
            if e.get("columns")
            else ""
        )
        lines.append(
            f"CREATE FORCE VIEW {q(e['name'])}{cols} AS "
            f"{_spark_expr_to_h2(e['definition'])};"
        )
        if e.get("remarks") is not None:
            comment_lines.append(
                f"COMMENT ON VIEW {q(e['name'])} IS "
                f"'{_esc(e['remarks'])}';"
            )
    # COMMENT ON lines LAST (every commented object already exists
    # on restore, whatever the dump's table/view interleave)
    lines.extend(comment_lines)
    return lines


def execute_script(engine: "Engine", statement: str, shadow: str) -> "DataFrame":
    """``SCRIPT NODATA [TO 'file'] [TABLE t1, t2, ...]`` — see module
    docstring."""
    tail = shadow[SCRIPT_RE.match(shadow).end() :]
    raw_tail = statement[SCRIPT_RE.match(shadow).end() :]
    nodata = False
    mn = re.match(r"\s*NODATA\b", tail, re.I)
    if mn:
        nodata = True
        raw_tail = raw_tail[mn.end() :]
        tail = tail[mn.end() :]
    to_file = None
    mt = re.match(r"\s*TO\s+'([^']*)'", tail, re.I)
    if mt:
        to_file = raw_tail[mt.start(1) : mt.end(1)]
        raw_tail = raw_tail[mt.end() :]
        tail = tail[mt.end() :]
    only_tables = None
    mtb = re.match(r"\s*TABLE\s+", tail, re.I)
    if mtb:
        from .sql_dml import _parse_ident, _resolve_schema_qualifier, _shadow

        rest = raw_tail[mtb.end() :]
        only_tables = []
        for part in rest.split(","):
            part = part.strip()
            pshadow = _shadow(part)
            name, pos = _parse_ident(part, pshadow, 0)
            name, pos = _resolve_schema_qualifier(
                engine, part, pshadow, name, pos, "SCRIPT TABLE"
            )
            if part[pos:].strip():
                raise ValueError(
                    f"SCRIPT: unexpected text after table name: "
                    f"{part[pos:].strip()!r}"
                )
            only_tables.append(name)
        tail = ""
    if tail.strip():
        raise ValueError(
            f"SCRIPT: unsupported option(s): {tail.strip().split()[0]!r} "
            "(supported grammar: SCRIPT NODATA [TO 'file'] "
            "[TABLE t1, t2, ...])"
        )
    if not nodata:
        raise ValueError(
            "SCRIPT without NODATA renders table DATA as driver-side "
            "INSERT literals — unsupported by design at this engine's "
            "scale. Use SCRIPT NODATA for the schema and CALL "
            "CSVWRITE (or parquet) for data."
        )
    lines = script_lines(engine, only_tables)
    if to_file is not None:
        with open(to_file, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    df = engine.spark.createDataFrame(
        [(ln,) for ln in lines], "SCRIPT string"
    )
    return df


def execute_runscript(engine: "Engine", statement: str, shadow: str) -> None:
    """``RUNSCRIPT FROM 'file' [CHARSET 'name']`` — each statement
    re-enters the full ``execute_sql`` front door."""
    m = re.match(r"\s*RUNSCRIPT\s+FROM\s+'([^']*)'", shadow, re.I)
    if not m:
        raise ValueError("RUNSCRIPT: expected RUNSCRIPT FROM 'file'")
    path = statement[m.start(1) : m.end(1)]
    tail = shadow[m.end() :]
    charset = "utf-8"
    mc = re.match(r"\s*CHARSET\s+'([^']*)'", tail, re.I)
    if mc:
        charset = statement[m.end() :][mc.start(1) : mc.end(1)]
        tail = tail[mc.end() :]
    if tail.strip():
        raise ValueError(
            f"RUNSCRIPT: unsupported option(s): {tail.strip().split()[0]!r} "
            "(supported grammar: RUNSCRIPT FROM 'file' [CHARSET 'name'])"
        )
    from .server import split_sql_script
    from .sql_dml import execute

    with open(path, "r", encoding=charset) as f:
        script = f.read()
    for stmt in split_sql_script(script):
        execute(engine, stmt)
    return None


def execute_explain(
    engine: "Engine", statement: str, shadow: str, m
) -> "DataFrame":
    """``EXPLAIN [ANALYZE] [PLAN FOR] <query>`` — see module
    docstring."""
    inner = statement[m.end() :].strip()
    inner_shadow = shadow[m.end() :].strip()
    if _SEQ_FUNC_RE.search(inner_shadow):
        raise ValueError(
            "EXPLAIN: the statement contains a sequence value function "
            "(NEXTVAL/CURRVAL/NEXT VALUE FOR), whose substitution on "
            "this surface ALLOCATES — H2's EXPLAIN does not. Explain "
            "the query without it."
        )
    if re.match(
        r"(?:UPDATE|DELETE|MERGE|INSERT|CREATE|DROP|TRUNCATE|ALTER|"
        r"RUNSCRIPT|SCRIPT|SET)\b",
        inner_shadow,
        re.I,
    ):
        raise ValueError(
            "EXPLAIN: only query statements are explainable on this "
            "surface — DML/DDL execute as catalog rewrites with no "
            "single Spark plan. EXPLAIN the statement's inner SELECT."
        )
    from .csv_table_funcs import CSVWRITE_RE

    if CSVWRITE_RE.match(inner_shadow):
        raise ValueError(
            "EXPLAIN: CSVWRITE executes its export as a side effect — "
            "H2's EXPLAIN never executes. Explain the embedded query "
            "instead."
        )
    from .sql_dml import execute

    df = execute(engine, inner)
    if not hasattr(df, "_jdf"):
        raise ValueError("EXPLAIN: the statement did not produce a query")
    if m.group("analyze"):
        df.count()  # execute, then explain the AQE-final plan
    jqe = df._jdf.queryExecution()
    try:
        jvm = engine.spark.sparkContext._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        text = jqe.explainString(mode)
    except Exception:  # pragma: no cover - jvm surface drift
        text = jqe.toString()
    return engine.spark.createDataFrame([(text,)], "PLAN string")
