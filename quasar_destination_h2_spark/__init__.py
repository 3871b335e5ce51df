"""quasar_destination_h2_spark — a PySpark-native analytics engine with
the query and data-processing capabilities of precog/quasar-destination-h2.

Tier A (the reference's own surface): typed headerless-CSV ingestion
into atomically-replaced tables, identifier hygiene, config
sanitization, session lifecycle, server bracketing.

Tier B (the delegated H2 SQL surface): full Spark SQL / DataFrame
query catalog in :mod:`.plans`.

[EXT] LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns, streaming) in :mod:`.operators` and
:mod:`.streaming`.
"""

from . import cache
from .config import Config
from .engine import Engine
from .errors import (
    ColumnTypesNotSupported,
    ConnectionFailed,
    EngineError,
    MalformedConfiguration,
    NotAResource,
)
from .types import Column, ColumnType, TypeOptions

__version__ = "0.1.0"

__all__ = [
    "cache",
    "Config",
    "Engine",
    "Column",
    "ColumnType",
    "TypeOptions",
    "EngineError",
    "NotAResource",
    "ColumnTypesNotSupported",
    "MalformedConfiguration",
    "ConnectionFailed",
]
