from .registry import QUERIES, ORACLE, query

# importing the modules populates the registry
from . import queries as _queries  # noqa: F401
from . import pipeline as _pipeline  # noqa: F401
from . import tpch as _tpch  # noqa: F401

__all__ = ["QUERIES", "ORACLE", "query"]
