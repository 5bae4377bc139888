"""PySpark-native analytics engine with Robust Predicate Transfer.

A from-scratch rebuild of the capabilities of the reference DuckDB
extension ``JP-Reddy/duckdb-robust-predicate-transfer`` (see
/root/reference, SURVEY.md): a planner that rewrites multi-join
queries to pre-filter join inputs via semi-join / Bloom-filter
predicate transfer (forward + backward pass over a spanning tree of
the join graph), plus the full relational query surface the reference
inherits from its host engine, re-expressed Spark-first, plus
large-scale data-pipeline operators (dedup, similarity search, text
analysis, streaming).

Nothing here is a port: the reference plans over DuckDB's logical
operator tree and executes C++ sink/source operators
(rpt_optimizer.cpp, physical_create_bf.cpp); we plan over a tiny
Python join-graph IR and emit ordinary DataFrame operations that
Catalyst/Tungsten/AQE execute (SURVEY.md section 7).
"""

from .config import RPTConfig
from .catalog import Catalog
from .engine import Engine, Rel
from .plans.ir import JoinEdge, TableNode

__all__ = ["RPTConfig", "Catalog", "Engine", "Rel", "JoinEdge", "TableNode"]

__version__ = "0.1.0"
