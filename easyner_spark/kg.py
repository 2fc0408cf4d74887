"""KnowledgeGraph — the consumer facade over the materialized KG.

The pipeline (cli.run_pipeline / streaming.incremental_kg) materializes
edge and node SnapshotTables; this class is the one-import surface a
downstream user drives them with:

    from easyner_spark.kg import KnowledgeGraph

    kg = KnowledgeGraph.load(spark, "/data/out")     # or KnowledgeGraph(edges_df)
    kg.query([("?x", "inhibits", "?y"),               # SPARQL-BGP-lite
              ("?y", "located_in+", "?z")],           # property path
             optionals=[[("?x", "binds", "?w")]],     # OPTIONAL
             minus=[[("?x", "activates", "?y")]],     # MINUS
             bindings={"x": ("aspirin", "ibuprofen")})# VALUES
    kg.distances(("aspirin",), k=3)                   # landmark BFS
    kg.paths(("aspirin",), ("fever",), max_len=3)     # path explanations
    kg.ego(("aspirin",), k=2)                         # neighborhood export
    kg.schema(types_df)                               # type-level quotient
    kg.pagerank(); kg.components(); kg.core_numbers() # analytics
    kg.conflicts([("capital_of", "functional")])      # consistency QA
    kg.summaries(k=5)                                 # entity cards

Every method is a thin delegation to the module operators (which carry
the scale contracts and DuckDB oracles); the facade adds exactly two
things: column-name defaults bound once at construction, and a cached
`stats()` table so every query() benefits from cost-based join
ordering without recomputing the predicate statistics per call (the
ANALYZE-once pattern — recompute by calling stats(refresh=True) after
an epoch fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class KnowledgeGraph:
    def __init__(
        self,
        edges: DataFrame,
        nodes: DataFrame | None = None,
        subj: str = "subj_id",
        pred: str = "pred",
        obj: str = "obj_id",
    ) -> None:
        self.edges = edges
        self.nodes = nodes
        self._cols = (subj, pred, obj)
        self._stats: dict | None = None

    @classmethod
    def load(cls, spark: SparkSession, output_dir: str) -> "KnowledgeGraph":
        """Open the run_pipeline product at `output_dir` (edges +
        nodes SnapshotTables)."""
        from easyner_spark.sinks.checkpoint import SnapshotTable

        edges = SnapshotTable(
            f"{output_dir}/edges", ["subj_id", "pred", "obj_id"]
        ).read(spark)
        nodes_t = SnapshotTable(f"{output_dir}/nodes", ["node"])
        nodes = (
            nodes_t.read(spark) if nodes_t.current_snapshot() is not None
            else None
        )
        return cls(edges, nodes)

    # -- planning ----------------------------------------------------------

    def stats(self, refresh: bool = False) -> dict:
        """Per-predicate (n_edges, n_subj, n_obj) — computed once and
        cached (bounded driver data); feeds query()'s join order."""
        if self._stats is None or refresh:
            from easyner_spark.operators.triples import bgp_stats

            s, p, o = self._cols
            self._stats = bgp_stats(self.edges, subj=s, pred=p, obj=o)
        return self._stats

    # -- queries -----------------------------------------------------------

    def query(self, patterns: list, **kwargs) -> DataFrame:
        """match_patterns with this KG's columns and cached stats —
        facade users get cost-based join ordering by default (the
        measured 4.4x-20x win over the syntactic heuristic, see
        tools/bgp_bench.py) without ever seeing bgp_stats; accepts the
        full keyword surface (distinct, optionals, minus, bindings,
        unions, filters, max_closure_depth)."""
        from easyner_spark.operators.triples import match_patterns

        s, p, o = self._cols
        kwargs.setdefault("stats", self.stats())
        return match_patterns(
            self.edges, patterns, subj=s, pred=p, obj=o, **kwargs
        )

    def _directed(self) -> DataFrame:
        import pyspark.sql.functions as F

        s, _, o = self._cols
        return self.edges.select(
            F.col(s).alias("src"), F.col(o).alias("dst")
        )

    def distances(self, landmarks: tuple, k: int = 3) -> DataFrame:
        from easyner_spark.operators.graph import shortest_paths

        return shortest_paths(self._directed(), landmarks, k=k)

    def paths(
        self, sources: tuple, targets: tuple, max_len: int = 3, **kwargs
    ) -> DataFrame:
        from easyner_spark.operators.graph import kg_paths

        return kg_paths(
            self._directed(), sources=sources, targets=targets,
            max_len=max_len, **kwargs,
        )

    def ego(self, seeds: tuple, k: int = 2) -> DataFrame:
        from easyner_spark.operators.graph import ego_subgraph

        s, p, o = self._cols
        return ego_subgraph(
            self.edges, seeds, k=k, src=s, dst=o, pred=p
        )

    def ego_dot(self, seeds: tuple, k: int = 2, **kwargs) -> str:
        """Graphviz DOT text of the labeled k-hop ego subgraph
        (bounded rendering sink; raises past max_edges)."""
        from easyner_spark.sinks.graphviz import to_dot

        return to_dot(self.ego(seeds, k=k), label="pred", **kwargs)

    def metapath(self, path: tuple) -> DataFrame:
        from easyner_spark.operators.triples import metapath_join

        s, _, o = self._cols
        return metapath_join(self.edges, path, subj=s, obj=o)

    # -- schema & QA -------------------------------------------------------

    def schema(self, types: DataFrame) -> DataFrame:
        from easyner_spark.operators.triples import schema_graph

        s, _, o = self._cols
        return schema_graph(self.edges, types, subj=s, obj=o)

    def conflicts(self, constraints: list) -> DataFrame:
        from easyner_spark.operators.triples import functional_violations

        # the operator's exactness contract needs DISTINCT (s, p, o)
        return functional_violations(self._edges_spo().distinct(), constraints)

    def summaries(self, k: int = 5) -> DataFrame:
        from easyner_spark.operators.triples import entity_summaries

        s, p, o = self._cols
        return entity_summaries(self.edges, k=k, subj=s, pred=p, obj=o)

    def _edges_spo(self) -> DataFrame:
        import pyspark.sql.functions as F

        s, p, o = self._cols
        return self.edges.select(
            F.col(s).alias("subj_id"),
            F.col(p).alias("pred"),
            F.col(o).alias("obj_id"),
        )

    # -- analytics ---------------------------------------------------------

    def pagerank(self, iters: int = 3) -> DataFrame:
        from easyner_spark.operators.graph import pagerank

        return pagerank(self._directed(), iters=iters)

    def components(self, **kwargs) -> DataFrame:
        from easyner_spark.operators.components import connected_components

        return connected_components(self._directed(), **kwargs)

    def core_numbers(self, k_max: int = 6) -> DataFrame:
        from easyner_spark.operators.graph import core_numbers

        return core_numbers(self._directed(), k_max=k_max)
