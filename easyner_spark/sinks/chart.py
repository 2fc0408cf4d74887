"""K4: top-n entity frequency bar chart (reference
scripts/analysis.py:82-122 `plot_frequency_barchart`: horizontal
seaborn bars of the ranked rollup, value labels at bar ends, spines
hidden, x-axis hidden).

Driver-side export of a driver-scale aggregate (<= 100 rows) — the
cluster part is the rollup + top_n (TakeOrderedAndProject), which this
sink just `.collect()`s. Two renderers:

  - `render_barchart_svg` — dependency-free SVG (always available in
    the engine's runtime). Single-series magnitude chart: one hue, no
    legend (the title names the series), thin rounded-end bars on a
    white surface, labels/values in ink — matching the reference's
    de-spined look.
  - `plot_frequency_barchart` — matplotlib port of the reference
    figure, import-gated (matplotlib is not in the engine's minimal
    runtime; raises at call time with a clear message when absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# single-series hue + ink tokens (WCAG AA against white)
_BAR = "#2563eb"
_INK = "#1e293b"
_MUTED = "#64748b"


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def render_barchart_svg(
    freq: DataFrame,
    n: int = 50,
    title: str | None = None,
    value_col: str = "total_count",
    label_col: str = "mention",
) -> str:
    """Ranked top-n horizontal bar chart as an SVG string.

    Matches the reference's content (top-n by total_count desc, value
    label at each bar end, no x axis); the caller writes the string to
    a file. Input is the entity_frequency rollup (any DataFrame with
    the label/value columns); ordering is the pinned ranked() order.
    """
    from easyner_spark.operators.analysis import top_n

    rows = [
        (r[label_col], int(r[value_col]))
        for r in top_n(freq.select(label_col, value_col), n).collect()
    ]
    title = title or f"Top {len(rows)} entities"
    bar_h, gap, pad_t, pad_b = 18, 8, 48, 16
    label_w, value_w, plot_w = 180, 64, 480
    width = label_w + plot_w + value_w + 24
    height = pad_t + pad_b + max(1, len(rows)) * (bar_h + gap) - gap
    vmax = max((v for _, v in rows), default=1) or 1
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="system-ui, sans-serif">',
        f'<rect width="{width}" height="{height}" fill="#ffffff"/>',
        f'<text x="12" y="28" font-size="16" font-weight="600" '
        f'fill="{_INK}">{_esc(title)}</text>',
    ]
    y = pad_t
    for label, value in rows:
        w = max(2, round(plot_w * value / vmax))
        parts.append(
            f'<text x="{label_w - 8}" y="{y + bar_h - 5}" font-size="12" '
            f'text-anchor="end" fill="{_INK}">{_esc(label)}</text>'
        )
        parts.append(
            f'<rect x="{label_w}" y="{y}" width="{w}" height="{bar_h}" '
            f'rx="3" fill="{_BAR}"/>'
        )
        parts.append(
            f'<text x="{label_w + w + 6}" y="{y + bar_h - 5}" font-size="12" '
            f'fill="{_MUTED}">{value}</text>'
        )
        y += bar_h + gap
    parts.append("</svg>")
    return "\n".join(parts)


def write_barchart_svg(freq: DataFrame, path: str, n: int = 50, **kw) -> None:
    """Driver-side SVG sink, filesystem-scheme aware: non-local URIs
    (hdfs://, s3a://, ...) go through the Hadoop FileSystem API so the
    chart stage works wherever the pipeline's output_dir lives (ADVICE
    r2 — every other stage already writes through Spark)."""
    svg = render_barchart_svg(freq, n=n, **kw)
    if "://" in path and not path.startswith("file:"):
        sc = freq.sparkSession.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        out = fs.create(hpath, True)
        try:
            out.write(bytearray(svg.encode("utf-8")))
        finally:
            out.close()
        return
    local = path
    if local.startswith("file:"):
        from urllib.parse import urlparse

        local = urlparse(local).path
    with open(local, "w", encoding="utf-8") as f:
        f.write(svg)


def plot_frequency_barchart(freq: DataFrame, n: int = 50, title: str | None = None):
    """Matplotlib port of the reference figure (analysis.py:82-122):
    horizontal bars, value labels, top/right/bottom spines hidden,
    x-axis hidden. Returns (fig, ax)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - env without matplotlib
        raise NotImplementedError(
            "matplotlib is not available in this runtime; use "
            "render_barchart_svg/write_barchart_svg for the built-in export"
        ) from exc

    from easyner_spark.operators.analysis import top_n

    pdf = top_n(freq.select("mention", "total_count"), n).toPandas()
    size = 10 if n <= 50 else 20
    fig, ax = plt.subplots(figsize=(size, size))
    ax.barh(pdf["mention"], pdf["total_count"], color=_BAR)
    ax.invert_yaxis()
    for side in ("top", "right", "bottom"):
        ax.spines[side].set_visible(False)
    ax.get_xaxis().set_visible(False)
    for yy, v in enumerate(pdf["total_count"]):
        ax.text(v, yy, f" {v}", va="center", color=_MUTED)
    ax.set_title(title or f"Top {len(pdf)} entities", size=20, pad=12)
    return fig, ax
