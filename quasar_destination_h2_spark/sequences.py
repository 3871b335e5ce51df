"""H2 sequence objects at the statement surface.

The reference's wire clients get H2 1.4.200 sequences through the
PG/TCP servers (``/root/reference/core/src/main/scala/quasar/
destination/h2/server/H2Server.scala:60-84``): ``CREATE SEQUENCE``,
``NEXTVAL('s')`` / ``NEXT VALUE FOR s`` (typically as generated ids
in INSERTs), ``CURRVAL('s')``, ``ALTER SEQUENCE ... RESTART``,
``DROP SEQUENCE``. Spark has no sequence objects, so the engine
implements them as statement-layer state:

* durable state is a tiny JSON file in the warehouse directory,
  read-modify-written under the same advisory-flock protocol as the
  table catalog (``sources/sink.py``) — same-host multi-process
  writers allocate disjoint values; multi-HOST warehouses need a
  transactional store, exactly the documented catalog limitation;
* ``NEXTVAL`` allocates one value per TEXTUAL occurrence in the
  statement (H2 evaluates per row; in ``INSERT ... VALUES`` every
  row spells its own NEXTVAL, so the two coincide). A NEXTVAL over a
  table-driven INSERT source (``INSERT INTO t SELECT NEXTVAL(..),
  ... FROM u``) allocates PER RESULT ROW like H2: the range is
  taken atomically with :meth:`Sequences.nextval` and values are
  assigned by a deterministic row_number (``sql_dml.
  _rewrite_nextval_select``). UPDATE/DELETE/MERGE — where one
  textual occurrence would apply across many existing rows — still
  raise;
* ``CURRVAL`` is session-scoped like H2's: the last value THIS
  engine dispensed; an error if the engine has not called NEXTVAL
  on that sequence yet.
"""

from __future__ import annotations

import json
import os
import tempfile

try:
    import fcntl
except ImportError:  # pragma: no cover — non-POSIX fallback
    fcntl = None  # type: ignore[assignment]


class SequenceError(ValueError):
    """Sequence misuse (unknown name, duplicate create, CURRVAL
    before NEXTVAL) — ValueError so the statement surface reports it
    like its other parse/validation errors."""


class Sequences:
    """Durable sequence registry for one warehouse directory."""

    def __init__(self, warehouse_dir: str):
        self.dir = warehouse_dir
        self.path = os.path.join(warehouse_dir, "_sequences.json")
        self._currval: dict[str, int] = {}  # session-scoped

    # -- locked state I/O ---------------------------------------------------

    def _locked(self):
        os.makedirs(self.dir, exist_ok=True)
        fh = open(os.path.join(self.dir, "_sequences.lock"), "w")
        if fcntl is not None:
            fcntl.flock(fh, fcntl.LOCK_EX)
        return fh

    def _read(self) -> dict:
        """Absence means an empty registry; anything ELSE (corrupt
        JSON, I/O error) must surface — treating corruption as
        absence would silently reset every sequence and re-dispense
        already-allocated values, breaking the durable-uniqueness
        guarantee this module exists to provide."""
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}
        except (json.JSONDecodeError, OSError) as e:
            raise SequenceError(
                f"sequence state unreadable at {self.path!r}: {e}"
            ) from e

    def _write(self, state: dict) -> None:
        # temp + rename: a reader never observes a half-written file
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix="_seq")
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    # -- DDL ----------------------------------------------------------------

    def create(
        self,
        name: str,
        start: int = 1,
        increment: int = 1,
        if_not_exists: bool = False,
    ) -> None:
        if increment == 0:
            raise SequenceError("CREATE SEQUENCE: INCREMENT BY must not be 0")
        key = name.casefold()
        with self._locked():
            state = self._read()
            if key in state:
                if if_not_exists:
                    return
                raise SequenceError(f"sequence already exists: {name!r}")
            state[key] = {"next": start, "inc": increment, "start": start}
            self._write(state)

    def drop(self, name: str, if_exists: bool = False) -> None:
        key = name.casefold()
        with self._locked():
            state = self._read()
            if key not in state:
                if if_exists:
                    return
                raise SequenceError(f"sequence not found: {name!r}")
            del state[key]
            self._write(state)
        self._currval.pop(key, None)

    def alter(
        self,
        name: str,
        restart: bool = False,
        with_: int | None = None,
        increment: int | None = None,
    ) -> None:
        """ALTER SEQUENCE: RESTART [WITH n] resets the next value
        (to its START WITH when n is omitted, like H2); INCREMENT BY
        changes the step without touching the current position."""
        key = name.casefold()
        with self._locked():
            state = self._read()
            if key not in state:
                raise SequenceError(f"sequence not found: {name!r}")
            s = state[key]
            if restart:
                s["next"] = s["start"] if with_ is None else with_
            if increment is not None:
                if increment == 0:
                    raise SequenceError(
                        "ALTER SEQUENCE: INCREMENT BY must not be 0"
                    )
                s["inc"] = increment
            self._write(state)

    # -- values -------------------------------------------------------------

    def nextval(self, name: str, n: int = 1) -> list[int]:
        """Atomically allocate ``n`` consecutive values; returns them
        in dispensing order."""
        key = name.casefold()
        with self._locked():
            state = self._read()
            if key not in state:
                raise SequenceError(f"sequence not found: {name!r}")
            s = state[key]
            vals = [s["next"] + i * s["inc"] for i in range(n)]
            s["next"] = s["next"] + n * s["inc"]
            self._write(state)
        self._currval[key] = vals[-1]
        return vals

    def currval(self, name: str) -> int:
        key = name.casefold()
        if key not in self._currval:
            raise SequenceError(
                f"CURRVAL: NEXTVAL has not been called for {name!r} "
                "in this session"
            )
        return self._currval[key]

    def exists(self, name: str) -> bool:
        return name.casefold() in self._read()

    def describe(self, name: str) -> dict:
        """Current durable state of one sequence: ``{"next": int,
        "inc": int, "start": int}`` — read-only snapshot (allocation
        still goes through :meth:`nextval`'s lock)."""
        key = name.casefold()
        state = self._read()
        if key not in state:
            raise SequenceError(f"sequence not found: {name!r}")
        return dict(state[key])

    def names(self) -> list[str]:
        """All registered sequence names (casefolded storage keys),
        sorted — the INFORMATION_SCHEMA.SEQUENCES row source."""
        return sorted(self._read())
