"""JDBC source/sink (ref: K3 Postgres destination, doc-only in the
reference — ``README.md:52-57,72-81``; the ``etlp.db`` namespace is
absent from its tree).

The reference's column DDL specs

    :specs [[:id :serial "PRIMARY KEY"] [:key :varchar] ...]

map to Spark's ``createTableColumnTypes`` write option. Reads use
predicate-pushdown partitioned scans (``partitionColumn`` /
``numPartitions``) so a 100 TB-adjacent dimension load parallelizes
instead of funneling through one connection.

No JDBC driver ships in this container, so these connectors are
exercised by spec/plumbing tests only; ``check`` reports failure
cleanly instead of raising.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etlp_spark.connectors.base import Destination, Source, WriteResult


def specs_to_column_types(specs: list[tuple]) -> str:
    """Reference DDL spec list → ``createTableColumnTypes`` string.

    ``[(:id, :serial, 'PRIMARY KEY'), (:key, :varchar)]`` →
    ``"id SERIAL PRIMARY KEY, key VARCHAR"`` (ref ``README.md:72-81``).
    """
    parts = []
    for spec in specs:
        name, sqltype, *rest = spec
        frag = f"{name} {str(sqltype).upper()}"
        if rest:
            frag += " " + " ".join(str(r) for r in rest)
        parts.append(frag)
    return ", ".join(parts)


@dataclass
class JdbcSource(Source):
    url: str
    table: str
    properties: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None
    num_partitions: int = 8
    lower_bound: int | None = None
    upper_bound: int | None = None
    stream_name: str = "jdbc-stream"

    def spec(self) -> dict[str, Any]:
        return {"type": "jdbc", "url": self.url, "table": self.table}

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", self.url).option("dbtable", self.table)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("numPartitions", self.num_partitions)
                .option("lowerBound", self.lower_bound)
                .option("upperBound", self.upper_bound)
            )
        return reader.load()


@dataclass
class JdbcSink(Destination):
    url: str
    table: str
    specs: list[tuple] = field(default_factory=list)
    mode: str = "append"
    batch_size: int = 1000
    properties: dict[str, str] = field(default_factory=dict)

    def spec(self) -> dict[str, Any]:
        out: dict[str, Any] = {"type": "jdbc", "url": self.url, "table": self.table}
        if self.specs:
            out["createTableColumnTypes"] = specs_to_column_types(self.specs)
        return out

    def write(self, df: DataFrame) -> WriteResult:
        writer = (
            df.write.format("jdbc")
            .mode(self.mode)
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("batchsize", self.batch_size)
        )
        if self.specs:
            writer = writer.option("createTableColumnTypes", specs_to_column_types(self.specs))
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()
        return WriteResult(rows=-1, target=f"{self.url}/{self.table}")
