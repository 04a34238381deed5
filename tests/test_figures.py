"""Smoke tests for the paper-figure layer (VERDICT r4 weak #7).

Every plotter indexes harness row dicts by string key; a harness field
rename would break ``--plot`` silently until a human ran it.  Synthetic
rows -> each plotter -> PNG exists in tmp.  Skips cleanly without
matplotlib.
"""

import os
import sys

import pytest

_EXP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "experiments",
)
sys.path.insert(0, _EXP)

import figures  # noqa: E402
from util import HAVE_MPL  # noqa: E402

pytestmark = pytest.mark.skipif(
    not HAVE_MPL, reason="matplotlib unavailable")


def _check(path):
    assert path is not None
    assert os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_plot_band_radius(tmp_path):
    rows = [
        {"g": g, "K": K,
         "containment_endpoint": 0.95, "containment_sup": 0.9,
         "target_endpoint": 0.95, "target_sup_approx": 0.9}
        for g in (0.05, 0.15) for K in (100, 1000, 10000)
    ]
    _check(figures.plot_band_radius(
        rows, out=str(tmp_path / "band_radius.png")))


def test_plot_wordblot_recall(tmp_path):
    rows = [
        {"p_min": p, "recall_at_k": 1.0, "precision": 1.0,
         "p_hat_mae": 0.05 if p < 0.8 else None}
        for p in (0.5, 0.6, 0.7, 0.8)
    ] + [{"index_memory": 123456, "seq_len": 100000}]
    _check(figures.plot_wordblot_recall(
        rows, out=str(tmp_path / "wordblot_recall.png")))


def test_plot_overlap_pr(tmp_path):
    rows = [
        {"err": e, "precision": 0.999 if e < 0.15 else None,
         "recall": 0.999, "n_reads": 1000}
        for e in (0.10, 0.12, 0.15)
    ]
    _check(figures.plot_overlap_pr(
        rows, out=str(tmp_path / "overlap_pr.png")))


def test_plot_genome_phases(tmp_path):
    rows = [
        {"pass": name, "t_index": 6.9, "t_discover": 8.7, "t_extend": 7.6,
         "extend_gcups": 0.76, "block_recall": 1.0, "size": 5_000_000}
        for name in ("cold", "warm")
    ]
    _check(figures.plot_genome_phases(
        rows, out=str(tmp_path / "genome_phases.png")))
