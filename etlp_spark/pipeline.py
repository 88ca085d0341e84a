"""Pipeline: the reference's ``connect → start-job`` surface
(``src/etlp/connector/core.clj:40-73``, ``src/etlp/core.clj:91-109``)
as a thin object over DataFrames.

Reference shape:

    EtlpConnect{source, destination, xform, threads}
    start  → wire source channel → N-thread transducer pipeline →
             destination channel (``core.clj:47-59``)
    drain  → block until the channel closes (``core.clj:97-108``)
    stop   → close the channel (``core.clj:60-63``)

Spark mapping: building the Pipeline builds a DataFrame lineage
(logical plan — nothing runs); ``run`` invokes the sink action, which
*is* the drain (a batch action blocks until complete); ``stop`` is a
no-op for batch. ``threads``/``partitions`` knobs are deliberately
dropped — parallelism belongs to Spark configs (SURVEY.md §7).

The engine registry (``Engine``) covers the reference's component
system: ``etlp-component`` registration (``src/etlp/core.clj:15-30``),
app init (``core.clj:133-147``) and command dispatch ``::start`` /
``::check`` (``core.clj:111-131``) — without Integrant: plain dicts
and closures.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from etlp_spark.connectors.base import CheckResult, Destination, Source, WriteResult
from etlp_spark.ops import Transform

SourceLike = Source | Callable[[SparkSession], DataFrame] | DataFrame


def split_by_expectations(df: DataFrame, checks: Sequence) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` by a data contract: ``(clean, violations)``.
    ``violations`` carries the original columns plus ``failed_checks``
    and ``envelope`` (the row JSON wrapped as an ETLP error envelope,
    ready for any error sink). Shared by batch ``Pipeline.quarantine``
    and the config-built streaming quarantine (one implementation, one
    cost model — see expectations.validate). Materializes the
    validated frame once: clean and violations are two consumers."""
    from etlp_spark.envelope import wrap_error
    from etlp_spark.expectations import validate

    res = validate(df, list(checks), materialize=True)
    data_cols = [c for c in res.violations.columns if c != "failed_checks"]
    violations = res.violations.withColumn(
        "envelope",
        wrap_error(F.to_json(F.struct(*[F.col(c) for c in data_cols]))),
    )
    return res.clean, violations


@dataclass
class Pipeline:
    """``expectations`` turns the data contract into an ENFORCEMENT
    point (round-5 upgrade of x67's report-only checks): rows
    violating any check are quarantined away from the sink — wrapped
    in the ETLP error envelope (the same shape the reference's error
    channel carries, ``src/etlp/utils/async.clj:49-51``) and routed to
    ``error_sink`` if one is given. Clean rows alone reach ``sink``;
    clean + violations always reconciles to the input count."""

    source: SourceLike
    transforms: Sequence[Transform] = ()
    sink: Destination | None = None
    name: str = "etlp-stream"
    expectations: Sequence = ()  # Sequence[expectations.Check]
    error_sink: Destination | None = None

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """Resolve source → composed transforms (the fused transducer
        chain, T9 — Catalyst collapses it into one codegen stage)."""
        if isinstance(self.source, DataFrame):
            df = self.source
        elif isinstance(self.source, Source):
            df = self.source.read(spark)
        else:
            df = self.source(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def quarantine(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        """Split the transformed frame by the data contract:
        ``(clean, violations)``. ``violations`` carries the original
        columns plus ``failed_checks`` (which checks each row broke)
        and ``envelope`` (the row JSON wrapped as an ETLP error
        envelope, ready for any error sink). One extra scan-stage
        pass for row checks; see expectations.validate for the cost
        model. Raises if no expectations are configured."""
        if not self.expectations:
            raise ValueError("pipeline has no expectations configured")
        return split_by_expectations(self.dataframe(spark), list(self.expectations))

    def run(self, spark: SparkSession) -> WriteResult:
        """start-job: execute the sink action and block to completion
        (C4 drain). Without a sink, counts rows (a pure action).

        With ``expectations`` configured, only CLEAN rows reach the
        sink; violations go to ``error_sink`` (or are counted and
        dropped if none is set), and the WriteResult's ``extra``
        records both sides so callers can reconcile counts."""
        if not self.expectations:
            df = self.dataframe(spark)
            if self.sink is None:
                return WriteResult(rows=df.count(), target="void")
            return self.sink.write(df)

        clean, violations = self.quarantine(spark)
        if self.sink is None:
            result = WriteResult(rows=clean.count(), target="void")
        else:
            result = self.sink.write(clean)
        if self.error_sink is not None:
            err_result = self.error_sink.write(violations)
            n_violations = err_result.rows
        else:
            n_violations = violations.count()
        extra = dict(result.extra or {})
        extra.update({"n_clean": result.rows, "n_violations": n_violations})
        return WriteResult(rows=result.rows, target=result.target, extra=extra)

    def check(self, spark: SparkSession) -> CheckResult:
        """::check command (ref ``src/etlp/core.clj:118-121``)."""
        if isinstance(self.source, Source):
            return self.source.check(spark)
        return CheckResult(True, "inline source")

    def run_with_errors(self, spark: SparkSession) -> tuple[WriteResult, DataFrame | None]:
        """D7/E2 parity: run the pipeline AND return the source's
        error-record frame (the reference routes failures to an error
        channel via the pipeline ex-handler,
        ``src/etlp/utils/async.clj:49-51``). Sources without an error
        side-channel return ``None``."""
        result = self.run(spark)
        errors = None
        if isinstance(self.source, Source) and hasattr(self.source, "errors_of"):
            errors = self.source.errors_of(spark)
        return result, errors


class Engine:
    """Component registry + command dispatch (R1-R3).

    ``register`` stores a pipeline factory under a name (the
    reference stores ``{:process-fn :etlp-config :etlp-mapper}`` under
    ``[::processors name]``); ``run`` dispatches commands like the
    reference's ``invoke-connector`` (``::start``/``::check``);
    unknown names/commands raise ``ValueError`` like the reference's
    ``IllegalArgumentException`` (``src/etlp/core.clj:28-30``).
    """

    def __init__(self, spark: SparkSession, config: dict[str, Any] | None = None):
        self.spark = spark
        self.config = config or {}
        self._processors: dict[str, Callable[[dict[str, Any]], Pipeline]] = {}

    def register(self, name: str, factory: Callable[[dict[str, Any]], Pipeline]) -> None:
        self._processors[name] = factory

    def processors(self) -> list[str]:
        return sorted(self._processors)

    def run(self, name: str, command: str = "start", options: dict[str, Any] | None = None):
        if name not in self._processors:
            raise ValueError(f"unknown processor {name!r}; registered: {self.processors()}")
        pipeline = self._processors[name]({**self.config, **(options or {})})
        if command == "start":
            return pipeline.run(self.spark)
        if command == "check":
            return pipeline.check(self.spark)
        if command == "dataframe":
            return pipeline.dataframe(self.spark)
        raise ValueError(f"unknown command {command!r}; expected start|check|dataframe")


def register_udf(spark: SparkSession, name: str, fn, return_type: str = "string",
                 vectorized: bool = False):
    """UDF registry (SURVEY.md §2.2 last row — the reference treats
    any Clojure fn in an xform as an informal UDF; here registration
    makes it callable from SQL and ``F.call_udf``).

    ``vectorized=True`` registers an Arrow-batched pandas UDF —
    always prefer it in hot paths (~10-100× over row-at-a-time).
    """
    if vectorized:
        from pyspark.sql.functions import pandas_udf

        udf_obj = pandas_udf(fn, return_type)
    else:
        from pyspark.sql.functions import udf as _udf

        udf_obj = _udf(fn, return_type)
    spark.udf.register(name, udf_obj)
    return udf_obj


def register_udtf(spark: SparkSession, name: str, cls, return_type: str):
    """Python UDTF registry (Spark 4): a class with an ``eval`` method
    yielding rows becomes a SQL table function — the engine's answer
    to the reference's "any fn in an xform" for one-to-many record
    expansion (T3 mapcat beyond what ``explode`` can express, e.g.
    stateful or multi-column fan-out).

    Arrow-optimized when the plan allows; still Python-speed per
    group — prefer ``explode``/``inline`` for anything expressible as
    an expression (same rule as row UDFs vs pandas UDFs).
    """
    from pyspark.sql.functions import udtf as _udtf

    udtf_obj = _udtf(cls, returnType=return_type)
    spark.udtf.register(name, udtf_obj)
    return udtf_obj
