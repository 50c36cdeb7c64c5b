"""graphics: every figure helper writes a non-empty PNG (headless Agg)."""

import os

import numpy as np

from openea_tpu import graphics


def test_metric_lines(tmp_path):
    out = graphics.metric_lines(
        {"MTransE": {"hits1": 0.6, "mrr": 0.7},
         "BootEA": {"hits1": 0.8, "mrr": 0.85}},
        metrics=("hits1", "mrr"),
        out_path=str(tmp_path / "lines.png"), title="t")
    assert os.path.getsize(out) > 1000


def test_metric_grid(tmp_path):
    out = graphics.metric_grid(
        {"EN_FR_15K": {"MTransE": 0.6, "BootEA": 0.8},
         "EN_DE_15K": {"MTransE": 0.65}},
        out_path=str(tmp_path / "grid.png"))
    assert os.path.getsize(out) > 1000


def test_hubness_picture(tmp_path):
    rng = np.random.RandomState(0)
    counts = rng.poisson(1.0, size=500)
    out = graphics.hubness_picture(counts, out_path=str(tmp_path / "hub.png"))
    assert os.path.getsize(out) > 1000


def test_degree_accuracy_bars(tmp_path):
    out = graphics.degree_accuracy_bars(
        {"[1,5)": 0.5, "[5,10)": 0.7, "[10,inf)": 0.9},
        out_path=str(tmp_path / "deg.png"))
    assert os.path.getsize(out) > 1000
