"""Graphviz DOT export for BOUNDED graph extracts.

The visualization companion to sinks/chart.py's SVG bars: render the
k-hop ego subgraph (graph.ego_subgraph), a rule-KG extract, or any
other bounded edge table as DOT text for graphviz/obsidian/mermaid
tooling. Driver-side by DESIGN and guarded by `max_edges` — this is a
human-rendering sink (nobody reads a million-edge picture), the same
bounded-collect contract as the chart sink; the corpus-scale exchange
format is sinks/rdf.to_ntriples.

Dependency-free: emits the DOT dialect directly (node ids quoted and
escaped, deterministic sorted order so re-runs are byte-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _q(s: str) -> str:
    return '"' + str(s).replace("\\", "\\\\").replace('"', '\\"') + '"'


def to_dot(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    label: str | None = None,
    name: str = "kg",
    directed: bool = True,
    max_edges: int = 5000,
) -> str:
    """DOT text for `edges`; `label` optionally names an edge-label
    column (e.g. pred). Raises on more than `max_edges` rows rather
    than silently truncating — cut the graph first (ego_subgraph,
    top-n filters), don't let a rendering sink hide data."""
    cols = [src, dst] + ([label] if label else [])
    rows = edges.select(*cols).limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        raise ValueError(
            f"to_dot: more than max_edges={max_edges} edges; render a "
            "bounded extract (ego_subgraph / filters) instead"
        )
    kind, arrow = ("digraph", "->") if directed else ("graph", "--")
    body = sorted(
        "  {} {} {}{};".format(
            _q(r[0]),
            arrow,
            _q(r[1]),
            f" [label={_q(r[2])}]" if label else "",
        )
        for r in rows
    )
    return "{} {} {{\n{}\n}}\n".format(kind, _q(name), "\n".join(body))


def write_dot(edges: DataFrame, path: str, **kwargs) -> None:
    """to_dot + atomic single-file write (tmp + rename, the chart
    sink's crash-safe recipe)."""
    import os

    text = to_dot(edges, **kwargs)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)
