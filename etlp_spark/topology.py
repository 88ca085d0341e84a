"""Topology: the reference's DAG builder (D1-D5,
``src/etlp/connector/dag.clj:70-110``) over DataFrames.

Reference IR:

    {:workflow [[:from :to] ...]
     :entities {name {:meta {:entity-type :processor|:xform ...}}}}

(``test/etlp/connector_test.clj:29-69``). Nodes exchange records over
channels; fan-out was *intended* via mult/tap but is dead code (the
``node-mults`` atom is never populated — ``dag.clj:73,80-94`` — so a
second edge from the same node silently overwrites the first).

Spark mapping — and two deliberate upgrades:

- **fan-out works**: a node consumed by 2+ downstream nodes is
  ``persist()``-ed once and shared (the mult/tap the reference meant
  to have);
- **fan-in works**: multiple inbound edges union by name (D5
  channel-merge ≈ UNION ALL).

Node kinds:

- ``processor``: ``fn(spark) -> DataFrame`` for roots, or
  ``fn(DataFrame) -> DataFrame`` downstream (the reference's
  processor fns also take "node data" — ``dag.clj:39-45``);
  a ``Source`` connector or a literal ``DataFrame`` also works.
- ``xform``: a ``Transform`` (``DataFrame -> DataFrame``) — the
  composed transducer attached to a channel (``dag.clj:58-68``).

Scale: the only materialization is the persist at genuine fan-out
points (StorageLevel MEMORY_AND_DISK so wide nodes spill instead of
OOM); everything else stays one lazy Catalyst plan per sink.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from etlp_spark.connectors.base import Source

NodeFn = Callable[..., DataFrame]


@dataclass
class Node:
    kind: str  # 'processor' | 'xform'
    fn: Any  # NodeFn | Transform | Source | DataFrame

    @staticmethod
    def processor(fn: Any) -> "Node":
        return Node("processor", fn)

    @staticmethod
    def xform(fn: Any) -> "Node":
        return Node("xform", fn)


class Topology:
    def __init__(self, workflow: Sequence[tuple[str, str]], entities: Mapping[str, Node]):
        self.workflow = [tuple(e) for e in workflow]
        self.entities = dict(entities)
        self._validate()

    def _validate(self) -> None:
        for a, b in self.workflow:
            for name in (a, b):
                if name not in self.entities:
                    raise ValueError(f"edge ({a!r}, {b!r}) references unknown node {name!r}")
        # cycle check (reference never checks; channels would deadlock)
        children: dict[str, list[str]] = {}
        for a, b in self.workflow:
            children.setdefault(a, []).append(b)
        seen: dict[str, int] = {}

        def visit(n: str) -> None:
            state = seen.get(n, 0)
            if state == 1:
                raise ValueError(f"topology has a cycle through {n!r}")
            if state == 2:
                return
            seen[n] = 1
            for c in children.get(n, []):
                visit(c)
            seen[n] = 2

        for n in self.entities:
            visit(n)

    def roots(self) -> list[str]:
        targets = {b for _, b in self.workflow}
        return [n for n in self.entities if n not in targets]

    def leaves(self) -> list[str]:
        sources = {a for a, _ in self.workflow}
        return [n for n in self.entities if n not in sources]

    def build(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Resolve every node to a DataFrame (ref ``dag/build``,
        ``dag.clj:70-110`` — but edges resolve by dependency, not
        declaration order, and fan-out/fan-in actually work)."""
        inbound: dict[str, list[str]] = {}
        outdegree: dict[str, int] = {}
        for a, b in self.workflow:
            inbound.setdefault(b, []).append(a)
            outdegree[a] = outdegree.get(a, 0) + 1

        resolved: dict[str, DataFrame] = {}

        def materialize(name: str) -> DataFrame:
            if name in resolved:
                return resolved[name]
            node = self.entities[name]
            parents = inbound.get(name, [])
            if not parents:
                df = self._resolve_root(spark, node, name)
            else:
                parent_dfs = [materialize(p) for p in parents]
                merged = parent_dfs[0]
                for extra in parent_dfs[1:]:  # D5 fan-in: channel merge
                    merged = merged.unionByName(extra)
                df = self._apply(node, merged, name)
            if outdegree.get(name, 0) > 1:  # D4 fan-out: working mult/tap
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
            resolved[name] = df
            return df

        for name in self.entities:
            materialize(name)
        return resolved

    def _resolve_root(self, spark: SparkSession, node: Node, name: str) -> DataFrame:
        fn = node.fn
        if isinstance(fn, DataFrame):
            return fn
        if isinstance(fn, Source):
            return fn.read(spark)
        if node.kind == "processor":
            return fn(spark)
        raise ValueError(f"root node {name!r} must be a processor/Source/DataFrame, got xform")

    def _apply(self, node: Node, df: DataFrame, name: str) -> DataFrame:
        fn = node.fn
        if isinstance(fn, DataFrame) or isinstance(fn, Source):
            raise ValueError(f"non-root node {name!r} cannot be a literal source")
        return fn(df)
