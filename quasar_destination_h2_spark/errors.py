"""Typed error taxonomy mirroring the reference connector's errors.

Reference parity:
  - ``NotAResource``            <- quasar ResourceError.notAResource
    (H2CsvCreateSink.scala:66-70)
  - ``ColumnTypesNotSupported`` <- ColumnTypesNotSupported.scala:24-25,
    raised with the aggregated list of *all* offending types
    (H2CsvCreateSink.scala:72-80)
  - ``MalformedConfiguration``  <- H2DestinationModule.scala:65-73
    (carries the *redacted* config, never the raw one)
  - ``ConnectionFailed``        <- H2DestinationModule.scala:96-99
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class NotAResource(EngineError):
    """The destination path does not name exactly one table segment."""

    def __init__(self, path: object):
        self.path = path
        super().__init__(f"not a resource (want exactly one path segment): {path!r}")


class ColumnTypesNotSupported(EngineError):
    """One or more column types cannot be loaded.

    Aggregates *every* unsupported type in the submitted schema, like
    the reference's ValidatedNel accumulation
    (H2CsvCreateSink.scala:72-80).
    """

    def __init__(self, types: list):
        self.types = list(types)
        super().__init__(f"column types not supported: {self.types}")


class MalformedConfiguration(EngineError):
    """Config failed to decode; carries only the sanitized config."""

    def __init__(self, sanitized_config: object, reason: str = ""):
        self.sanitized_config = sanitized_config
        self.reason = reason
        super().__init__(
            f"malformed configuration: {reason or 'decode failed'} "
            f"(config: {sanitized_config!r})"
        )


class ConnectionFailed(EngineError):
    """The engine session could not be established / validated."""

    def __init__(self, reason: str = ""):
        super().__init__(f"connection failed: {reason}")


class CyclicRecursionError(EngineError):
    """A ``WITH RECURSIVE`` query hit Spark's recursion level limit.

    A UNION ALL recursive CTE can only terminate when each step stops
    producing rows; on cyclic data (graph reachability, connected
    components) every edge re-derives its endpoints forever and Spark
    aborts at the recursion level limit with an opaque SparkException.
    The engine translates that into this typed error so the user gets
    the actionable choice up front:

    * genuinely deep but ACYCLIC recursion: raise the limit in the
      statement (``WITH RECURSIVE t(col) MAX RECURSION LEVEL n``);
    * CYCLIC dataflow: use the driver-controlled fixpoint operator
      (:func:`quasar_destination_h2_spark.operators.iterate.fixpoint`),
      which converges on a caller-supplied measure instead of
      row-production — ``operators.dedup.dedup_clusters`` is the
      worked example (connected components over a cyclic edge set).
    """

    def __init__(self, original: str):
        self.original = original
        super().__init__(
            "recursive query hit Spark's recursion level limit. If the "
            "recursion is deep but acyclic, raise it with 'WITH RECURSIVE "
            "t(col) MAX RECURSION LEVEL <n>'. If the data is CYCLIC "
            "(graph reachability / connected components), a UNION ALL "
            "recursive CTE can never terminate — use the fixpoint "
            "operator instead: quasar_destination_h2_spark.operators."
            "iterate.fixpoint (see operators.dedup.dedup_clusters for a "
            f"worked example). Original error: {original}"
        )
