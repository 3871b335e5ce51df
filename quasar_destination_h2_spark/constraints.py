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

Documented choice: ``CHECK`` and ``FOREIGN KEY`` keep REJECTING
LOUDLY. A recorded-but-unenforced integrity predicate is worse than
an error — readers of the catalog would trust a contract no write
path upholds — and enforcing CHECK across every write surface (CSV
sink appends, DML rewrites, wire inserts) cannot be guaranteed here.

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

    def add(
        self,
        table: str,
        ctype: str,
        columns: list[str],
        name: str | None = None,
    ) -> str:
        """Record one constraint; returns its (possibly generated)
        name. H2 parity: at most one PRIMARY KEY per table; names are
        unique per table (H2 scopes them per schema — per table is
        the stricter, safer subset); unnamed constraints get
        H2-looking ``CONSTRAINT_<n>`` names."""
        if ctype not in ("PRIMARY KEY", "UNIQUE"):
            raise ConstraintError(
                f"only PRIMARY KEY and UNIQUE are recordable, got {ctype!r}"
            )
        if not columns:
            raise ConstraintError(f"{ctype} needs at least one column")
        key = table.casefold()
        with self._locked():
            state = self._read()
            entries = state.setdefault(key, [])
            if ctype == "PRIMARY KEY" and any(
                e["type"] == "PRIMARY KEY" for e in entries
            ):
                raise ConstraintError(
                    f"table {table!r} already has a PRIMARY KEY"
                )
            if name is None:
                taken = {e["name"].casefold() for e in entries}
                i = len(entries) + 1
                while f"constraint_{i}" in taken:
                    i += 1
                name = f"CONSTRAINT_{i}"
            elif any(
                e["name"].casefold() == name.casefold() for e in entries
            ):
                raise ConstraintError(
                    f"constraint {name!r} already exists on {table!r}"
                )
            entries.append(
                {"name": name, "type": ctype, "columns": list(columns)}
            )
            self._write(state)
        return name

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
