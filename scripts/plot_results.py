#!/usr/bin/env python
"""Regenerate the reference's paper figures from stored benchmark JSONs.

Parity: the reference's figure pipeline (``bash/experiment/fig[1-5]*.sh``
producing pickles consumed by ``DFGNN/utils/plot_fig[1-5].py``).  Here the
test/bench scripts store JSON under ``results/`` (``--store-result``) and
this script renders the five figure analogs:

  fig1  batched-graph throughput per (dataset, format)   <- batch_*.json
  fig2  full-graph throughput per (dataset, format)      <- full_*.json
  fig3  super-node full graphs (reddit/ppa/protein)      <- full_*.json
  fig4  feature-dim shmoo                                <- shmoo_*.json
  fig5  batch-size shmoo                                 <- shmoo_*.json

Usage:
    python scripts/plot_results.py [--results results] [--out figures]
"""

import argparse
import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_SUPER = ("reddit", "ppa", "protein")


def _load(results_dir, prefix):
    out = {}
    for p in sorted(glob.glob(os.path.join(results_dir, f"{prefix}_*.json"))):
        with open(p) as f:
            out[os.path.basename(p)[:-5]] = json.load(f)
    return out


def _bars(ax, data, title):
    """data: {dataset: {format: edges/s}}"""
    datasets = sorted(data)
    formats = sorted({f for d in data.values() for f in d})
    w = 0.8 / max(len(formats), 1)
    for i, fmt in enumerate(formats):
        xs = [j + i * w for j in range(len(datasets))]
        ys = [data[d].get(fmt, 0) / 1e6 for d in datasets]
        ax.bar(xs, ys, width=w, label=fmt)
    ax.set_xticks([j + 0.4 - w / 2 for j in range(len(datasets))])
    ax.set_xticklabels(datasets, rotation=20)
    ax.set_ylabel("Medges/s")
    ax.set_title(title)
    ax.legend(fontsize=7)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", default="results")
    ap.add_argument("--out", default="figures")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    made = []

    batch = _load(args.results, "batch")
    if batch:
        data = {}
        for name, blob in batch.items():
            ds = blob["args"].get("dataset", name)
            data[ds] = {f: r["edges_per_s"]
                        for f, r in blob["results"].items()}
        fig, ax = plt.subplots(figsize=(7, 3.2), dpi=120)
        _bars(ax, data, "fig1: batched graphs, fused attn conv")
        fig.tight_layout()
        p = os.path.join(args.out, "fig1_batch.png")
        fig.savefig(p)
        made.append(p)

    full = _load(args.results, "full")
    if full:
        for fig_id, names in (("fig2_full", lambda d: d not in _SUPER),
                              ("fig3_super", lambda d: d in _SUPER)):
            data = {}
            for name, blob in full.items():
                ds = blob["args"].get("dataset", name)
                if names(ds):
                    data[ds] = {f: r["edges_per_s"]
                                for f, r in blob["results"].items()}
            if not data:
                continue
            fig, ax = plt.subplots(figsize=(6, 3.2), dpi=120)
            _bars(ax, data, fig_id.replace("_", ": "))
            fig.tight_layout()
            p = os.path.join(args.out, f"{fig_id}.png")
            fig.savefig(p)
            made.append(p)

    shmoo = _load(args.results, "shmoo")
    for name, blob in shmoo.items():
        # schema: results -> {conv: {axis: {x: {impl: ms, ..., n_edges}}}}
        for conv, axes in blob["results"].items():
            for fig_id, key in (("fig4_dim", "dim"),
                                ("fig5_batch", "batch_size")):
                grid = axes.get(key) or {}
                if not grid:
                    continue
                impls = sorted({i for r in grid.values() for i in r
                                if i not in ("winner", "default_ok",
                                             "n_edges")})
                fig, ax = plt.subplots(figsize=(5, 3.2), dpi=120)
                for impl in impls:
                    pts = sorted(
                        (int(x), r["n_edges"] / (r[impl] / 1e3) / 1e6)
                        for x, r in grid.items() if impl in r)
                    if pts:
                        ax.plot([x for x, _ in pts], [y for _, y in pts],
                                marker="o", label=impl, lw=1.2, ms=3)
                ax.set_xlabel(key)
                ax.set_ylabel("Medges/s")
                ax.set_xscale("log", base=2)
                ax.set_title(f"{fig_id}: {conv} (bf16 impls + fp32 flash)")
                ax.legend(fontsize=7)
                fig.tight_layout()
                p = os.path.join(args.out, f"{fig_id}_{conv}.png")
                fig.savefig(p)
                made.append(p)

    if not made:
        print("no results/*.json found — run the test/bench scripts with "
              "--store-result first")
    for p in made:
        print("wrote", p)


if __name__ == "__main__":
    main()
