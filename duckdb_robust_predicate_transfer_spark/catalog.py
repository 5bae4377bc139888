"""Table registry: name -> DataFrame + statistics.

The analogue of the reference's ``TableManager`` (table_manager.cpp:
36-92), which assigns every base table an id and captures
``estimated_cardinality`` at registration time. Here statistics come
free from Parquet footers (no Spark job, no full scan) — the same
numbers a catalog/ANALYZE would provide on a cluster.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def parquet_row_count(path: str) -> int:
    """Row count from Parquet footer metadata (cheap, exact, no scan)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        ds = pq.ParquetDataset(path)
        return sum(pq.ParquetFile(f).metadata.num_rows for f in ds.files)
    return pq.ParquetFile(path).metadata.num_rows


@dataclass
class TableInfo:
    name: str
    path: str
    row_count: int


class Catalog:
    """Lazy loader over a scale-factor directory of Parquet tables."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._dfs: dict[str, DataFrame] = {}
        self._info: dict[str, TableInfo] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.sf_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._dfs:
            if name == "events":
                self._dfs[name] = self._read_events()
            else:
                self._dfs[name] = self.spark.read.parquet(self.path(name))
        return self._dfs[name]

    def _read_events(self) -> DataFrame:
        """events.ts has been generated as either parquet TIMESTAMP(NANOS)
        — which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL])
        — or TIMESTAMP(MICROS), depending on the fixture generation. Handle
        both: enable the runtime-settable nanosAsLong legacy conf (a no-op
        for non-nano columns), and if ts then surfaces as a raw long,
        truncate nanos to microseconds with integer division (a double
        division would lose precision at 1e18 ns) — the same truncation
        DuckDB applies, so oracle comparisons agree."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(self.path("events"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df

    def info(self, name: str) -> TableInfo:
        if name not in self._info:
            p = self.path(name)
            self._info[name] = TableInfo(name, p, parquet_row_count(p))
        return self._info[name]

    def row_count(self, name: str) -> int:
        return self.info(name).row_count

    def register_views(self, names=TABLES) -> None:
        for n in names:
            if os.path.exists(self.path(n)):
                self.table(n).createOrReplaceTempView(n)


_CATALOGS: dict[tuple[int, str], Catalog] = {}


def get_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    """Per-(session, dir) catalog cache so repeated query calls reuse readers."""
    key = (id(spark), os.path.abspath(sf_dir))
    cat = _CATALOGS.get(key)
    if cat is None:
        cat = _CATALOGS[key] = Catalog(spark, sf_dir)
    return cat
