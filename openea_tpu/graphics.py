"""Publication-figure helpers over run summaries and analysis outputs.

Capability parity with the reference's plotting layer
(reference src/openea/expriment/graphics.py:12-220: per-method grid
heatmaps, cross-method metric line plots, two-panel hubness pictures),
re-designed around this package's data sources — `statistics.parse_log`
fold summaries and `experiment.hubness` counts — instead of the
reference's hard-coded VLDB2020 result-folder walker.

Headless-first: matplotlib is imported lazily with the Agg backend and
every function *saves* a file (the reference calls plt.show()).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def metric_lines(
    results: Dict[str, Dict[str, float]],
    metrics: Sequence[str] = ("hits1", "hits5", "mrr"),
    out_path: str = "metric_lines.png",
    title: str = "",
) -> str:
    """Cross-method comparison line plot (reference plot_figure :165-182).

    results: {method: {metric: value}}; one line per metric over the
    methods on the x-axis.
    """
    plt = _plt()
    methods = list(results)
    fig, ax = plt.subplots(figsize=(max(6, 1.2 * len(methods)), 4.5))
    markers = "osd^v*"
    for i, metric in enumerate(metrics):
        ys = [results[m].get(metric, np.nan) for m in methods]
        ax.plot(methods, ys, marker=markers[i % len(markers)], label=metric)
    ax.set_xticks(range(len(methods)))
    ax.set_xticklabels(methods, rotation=45, ha="right")
    ax.set_ylabel("metric value")
    if title:
        ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def metric_grid(
    table: Dict[str, Dict[str, float]],
    out_path: str = "metric_grid.png",
    metric: str = "hits1",
    title: str = "",
) -> str:
    """Dataset x method heatmap (reference grid_figure :144-162).

    table: {dataset: {method: value}} for one metric.
    """
    plt = _plt()
    datasets = list(table)
    methods = sorted({m for row in table.values() for m in row})
    grid = np.full((len(datasets), len(methods)), np.nan)
    for i, d in enumerate(datasets):
        for j, m in enumerate(methods):
            if m in table[d]:
                grid[i, j] = table[d][m]
    fig, ax = plt.subplots(
        figsize=(max(6, 0.9 * len(methods)), max(3, 0.6 * len(datasets))))
    im = ax.imshow(grid, cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(methods)))
    ax.set_xticklabels(methods, rotation=-90)
    ax.set_yticks(range(len(datasets)))
    ax.set_yticklabels(datasets)
    fig.colorbar(im, ax=ax, label=metric)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def hubness_picture(
    hub_counts: np.ndarray,
    out_path: str = "hubness.png",
    title: str = "",
    max_k: Optional[int] = None,
) -> str:
    """Two-panel hubness figure (reference hub_picture :188-220):
    left = distribution of how often each target is retrieved as the
    nearest neighbor, right = cumulative share covered by the most-hubby
    targets.  `hub_counts` comes from `experiment.hubness`.
    """
    plt = _plt()
    counts = np.asarray(hub_counts, dtype=np.int64)
    occ = np.bincount(counts, minlength=2)
    sorted_counts = np.sort(counts)[::-1]
    cum = np.cumsum(sorted_counts) / max(1, sorted_counts.sum())
    if max_k is not None:
        occ = occ[: max_k + 1]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))
    ax1.bar(range(len(occ)), occ)
    ax1.set_xlabel("times retrieved as NN (k-occurrence)")
    ax1.set_ylabel("#target entities")
    ax1.set_yscale("symlog")
    ax2.plot(np.arange(1, len(cum) + 1) / len(cum), cum)
    ax2.set_xlabel("fraction of targets (hubbiest first)")
    ax2.set_ylabel("cumulative share of retrievals")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def degree_accuracy_bars(
    interval_acc: Dict[str, float],
    out_path: str = "degree_accuracy.png",
    title: str = "",
) -> str:
    """Accuracy-by-degree-interval bar chart over
    `statistics.degree_interval_accuracy` output (the reference draws
    these from degree_interval.py results by hand)."""
    plt = _plt()
    labels = list(interval_acc)
    values = [interval_acc[k] for k in labels]
    fig, ax = plt.subplots(figsize=(max(5, 0.8 * len(labels)), 4))
    ax.bar(labels, values)
    ax.set_xlabel("entity degree interval")
    ax.set_ylabel("Hits@1")
    ax.set_ylim(0, 1)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
