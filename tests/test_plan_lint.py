"""Fleet-wide plan linter: global physical-plan invariants over EVERY
declared query, executed (so AQE's final strategy is what's linted).

The per-query pins in test_plan_shapes.py guard specific known-risky
shapes; this linter guards the whole fleet against the three plan
pathologies that sink a 100 TB run no matter which query they appear
in:

- ``CartesianProduct`` — a non-broadcast quadratic pair expansion.
  Broadcast-literal cross joins plan as BroadcastNestedLoopJoin (the
  build side fit under the broadcast threshold by construction);
  CartesianProduct means BOTH sides were corpus-sized. Zero today.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in a query path
  (the repo's kernels are JVM expressions or Arrow-batched
  mapInPandas, which plans as its own node). Zero today.
- ``rangepartitioning`` — a corpus-wide global sort (top-k must plan
  TakeOrderedAndProject; percentile-ish work runs on compact
  histograms). Zero today at the lint SF.

One test, all queries, every violation reported at once — adding a
query that regresses any invariant fails loudly with its name.
"""

from etlp_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython", "rangepartitioning")

#: No exemptions today. If a future query legitimately needs one of
#: the forbidden shapes (e.g. a documented exact-spec twin whose
#: semantics ARE a global sort), whitelist it here as
#: {query_name: {node, ...}} with a comment saying why.
ALLOWED: dict[str, set[str]] = {}


def test_no_forbidden_plan_nodes_anywhere(spark):
    violations: dict[str, list[str]] = {}
    for name, q in QUERIES.items():
        df = q.fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = [
            n for n in FORBIDDEN
            if n in plan and n not in ALLOWED.get(name, set())
        ]
        if bad:
            violations[name] = bad
    assert not violations, (
        "queries grew forbidden plan nodes (quadratic expansion, "
        f"row-Python, or global sort): {violations}"
    )
