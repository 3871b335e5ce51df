"""H2 PRIMARY KEY / UNIQUE constraints as recorded catalog metadata.

The reference's init-script and RUNSCRIPT paths run arbitrary user
DDL (``/root/reference/core/src/main/scala/quasar/destination/h2/
server/H2Server.scala:41-58``), and a dump authored by a REAL H2
instance routinely carries PRIMARY KEY / UNIQUE constraints — inline
in column defs, as table-level clauses, and as H2 SCRIPT's own
``ALTER TABLE ... ADD CONSTRAINT ... PRIMARY KEY(...)`` lines.
Parquet tables have no enforced keys, so — exactly like the CREATE
INDEX no-op (sql_dml.py) — PK/UNIQUE are ACCEPTED AND RECORDED:
foreign dumps restore, the constraint surfaces in
``INFORMATION_SCHEMA.CONSTRAINTS`` and SHOW COLUMNS' KEY column
where H2 spells it, SCRIPT re-emits it, and PK columns are marked
NOT NULL (H2's semantic).

``CHECK`` constraints are ACCEPTED AND ENFORCED (r11 verdict task
2): every INSERT / UPDATE / MERGE flows through the engine's DML
rewrite (sql_dml -> Engine.insert_rows / update_where / merge_into),
so a recorded predicate costs ONE bounded filter over the written
rows — violating statements raise :class:`CheckViolation` with the
constraint name and example rows BEFORE anything lands. ALTER ADD
validates the existing rows first (one scan), H2's own behavior.
PK/UNIQUE stay record-only (enforcement would be an O(table)
anti-join per write). Documented choice: ``FOREIGN KEY`` keeps
REJECTING LOUDLY — cross-table enforcement on every write is a
different cost class, and a recorded-but-unenforced referential
predicate is worse than an error.

Durable state is a tiny JSON file in the warehouse directory under
the same advisory-flock protocol as the sequence registry
(sequences.py) — bounded driver-side metadata, never data-path work.
"""

from __future__ import annotations

import json
import os
import tempfile

try:
    import fcntl
except ImportError:  # pragma: no cover — non-POSIX fallback
    fcntl = None  # type: ignore[assignment]


class ConstraintError(ValueError):
    """Constraint misuse (duplicate name, unknown table/name) —
    ValueError so the statement surface reports it like its other
    parse/validation errors."""


class CheckViolation(ConstraintError):
    """A DML write (or ALTER ADD over existing rows) produced rows
    failing a recorded CHECK predicate — the statement is rejected
    BEFORE anything is written (H2's integrity-violation error)."""


class Constraints:
    """Durable PK/UNIQUE registry for one warehouse directory.

    State shape: ``{table_key: [{"name": str, "type": "PRIMARY KEY"
    | "UNIQUE", "columns": [str, ...]}, ...]}`` — table keys are
    casefolded logical names; column names are stored as spelled."""

    def __init__(self, warehouse_dir: str):
        self.dir = warehouse_dir
        self.path = os.path.join(warehouse_dir, "_constraints.json")

    # -- locked state I/O ---------------------------------------------------

    def _locked(self):
        os.makedirs(self.dir, exist_ok=True)
        fh = open(os.path.join(self.dir, "_constraints.lock"), "w")
        if fcntl is not None:
            fcntl.flock(fh, fcntl.LOCK_EX)
        return fh

    def _read(self) -> dict:
        """Absence = empty registry; corruption surfaces (the
        sequences._read rationale: silently resetting metadata would
        break the restore contract this module exists for)."""
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}
        except (json.JSONDecodeError, OSError) as e:
            raise ConstraintError(
                f"constraint state unreadable at {self.path!r}: {e}"
            ) from e

    def _write(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix="_con")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    # -- mutations ------------------------------------------------------

    def _add_to_state(
        self,
        state: dict,
        table: str,
        ctype: str,
        columns: list[str],
        name: str | None,
        predicate: str | None,
    ) -> str:
        """Validate + append one constraint into an in-memory state
        snapshot (caller holds the lock and writes once — the
        atomicity carrier for multi-constraint DDL, advisor r11).
        H2 parity: at most one PRIMARY KEY per table; names are
        unique across the whole SCHEMA (H2's scope — a per-table
        scope would let two tables share a name and the SCRIPT dump
        would then be rejected by a real H2 on restore, advisor
        r11); unnamed constraints get H2-looking ``CONSTRAINT_<n>``
        names, counted per table but skipping any schema-wide
        collision."""
        if ctype not in ("PRIMARY KEY", "UNIQUE", "CHECK"):
            raise ConstraintError(
                f"only PRIMARY KEY, UNIQUE and CHECK are recordable, "
                f"got {ctype!r}"
            )
        if ctype == "CHECK":
            if not predicate or not predicate.strip():
                raise ConstraintError("CHECK needs a predicate")
        elif not columns:
            raise ConstraintError(f"{ctype} needs at least one column")
        key = table.casefold()
        entries = state.setdefault(key, [])
        if ctype == "PRIMARY KEY" and any(
            e["type"] == "PRIMARY KEY" for e in entries
        ):
            raise ConstraintError(
                f"table {table!r} already has a PRIMARY KEY"
            )
        taken_schema = {
            e["name"].casefold() for es in state.values() for e in es
        }
        if name is None:
            i = len(entries) + 1
            while f"constraint_{i}" in taken_schema:
                i += 1
            name = f"CONSTRAINT_{i}"
        elif name.casefold() in taken_schema:
            raise ConstraintError(
                f"constraint {name!r} already exists in schema PUBLIC "
                "(H2 scopes constraint names per schema, not per table)"
            )
        entry = {"name": name, "type": ctype, "columns": list(columns)}
        if ctype == "CHECK":
            entry["predicate"] = predicate.strip()
        entries.append(entry)
        return name

    def add(
        self,
        table: str,
        ctype: str,
        columns: list[str],
        name: str | None = None,
        predicate: str | None = None,
    ) -> str:
        """Record one constraint; returns its (possibly generated)
        name. See :meth:`_add_to_state` for the H2-parity rules."""
        with self._locked():
            state = self._read()
            name = self._add_to_state(
                state, table, ctype, columns, name, predicate
            )
            self._write(state)
        return name

    def add_many(self, table: str, cons: list[tuple]) -> list[str]:
        """Record a CREATE TABLE's whole constraint set in ONE locked
        read-validate-write cycle (one atomic ``os.replace``): a
        crash can no longer land between a table write and its n-th
        constraint record, leaving a restored table silently missing
        declared metadata (advisor r11). ``cons`` items are
        ``(name_or_None, ctype, columns[, predicate])`` as the DDL
        parser produces them. All-or-nothing: any invalid entry
        raises before anything is written."""
        names = []
        with self._locked():
            state = self._read()
            for item in cons:
                cname, ctype, cols = item[0], item[1], item[2]
                pred = item[3] if len(item) > 3 else None
                names.append(
                    self._add_to_state(
                        state, table, ctype, cols, cname, pred
                    )
                )
            if names:
                self._write(state)
        return names

    def drop(self, table: str, name: str, if_exists: bool = False) -> None:
        key = table.casefold()
        with self._locked():
            state = self._read()
            entries = state.get(key, [])
            kept = [
                e for e in entries if e["name"].casefold() != name.casefold()
            ]
            if len(kept) == len(entries):
                if if_exists:
                    return
                raise ConstraintError(
                    f"constraint not found on {table!r}: {name!r}"
                )
            if kept:
                state[key] = kept
            else:
                state.pop(key, None)
            self._write(state)

    def drop_table(self, table: str) -> None:
        """Forget every constraint of a dropped table (no-op when
        none are recorded)."""
        key = table.casefold()
        with self._locked():
            state = self._read()
            if key in state:
                del state[key]
                self._write(state)

    def rename_table(self, old: str, new: str) -> None:
        """Migrate recorded constraints on ALTER TABLE RENAME."""
        okey, nkey = old.casefold(), new.casefold()
        with self._locked():
            state = self._read()
            if okey in state:
                state[nkey] = state.pop(okey)
                self._write(state)

    # -- reads ----------------------------------------------------------

    def for_table(self, table: str) -> list[dict]:
        return [dict(e) for e in self._read().get(table.casefold(), [])]

    def all(self) -> dict[str, list[dict]]:
        """Whole registry snapshot (casefolded table key -> entries),
        sorted for deterministic introspection output."""
        return {
            k: [dict(e) for e in v]
            for k, v in sorted(self._read().items())
        }
