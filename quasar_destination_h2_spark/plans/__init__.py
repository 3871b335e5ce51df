from .catalog import REGISTRY, Query, all_queries, all_oracles, query

# importing these modules populates REGISTRY
from . import tierb  # noqa: E402,F401
from . import ext  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "all_queries", "all_oracles", "query"]
