#!/usr/bin/env python
"""Convert standard public dataset artifacts into dfgnn-tpu's npz schema.

The reference consumes DGL/OGB datasets directly (``DFGNN/utils/util.py:
41-148``); this environment has no egress, so this tool converts artifacts
the user already has on disk into ``<data_dir>/<name>.npz`` (full graphs)
or ``<data_dir>/<name>_batched.npz`` (batched), which
``dfgnn_tpu.data.datasets`` loads natively.

Supported source formats:

* ``reddit``: DGL's download pair ``reddit_graph.npz`` (scipy CSR) +
  ``reddit_data.npz`` (feature/label/node_types with 1=train 2=val 3=test).
* ``ogbn-*`` node datasets: the extracted ``raw/`` directory
  (``edge.csv.gz``, ``node-feat.csv.gz``, ``node-label.csv.gz``) plus
  optional ``split/*/{train,valid,test}.csv.gz``.
* ``ogbg-*`` graph datasets: the extracted ``raw/`` directory
  (``edge.csv.gz``, ``num-node-list.csv.gz``, ``num-edge-list.csv.gz``,
  ``node-feat.csv.gz``, ``graph-label.csv.gz``).
* ``coo``: generic ``rows.npy / cols.npy / features.npy / labels.npy``
  (+ optional ``{train,val,test}_mask.npy``) in a directory.
* planetoid ``ind.<name>.*`` pickles need no conversion (loaded natively).

Usage:
    python scripts/convert_dataset.py reddit --src ~/downloads/reddit \
        --out data
    python scripts/convert_dataset.py ogbn-arxiv --src ogbn_arxiv/raw \
        --out data --name arxiv
"""

import argparse
import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _read_csv_gz(path, dtype):
    """Comma-separated (or single-column) numeric csv[.gz] -> ndarray."""
    opener = gzip.open if path.endswith(".gz") else open
    if not os.path.exists(path) and not path.endswith(".gz"):
        path = path + ".gz"
        opener = gzip.open
    with opener(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def convert_reddit(src: str, out_dir: str, name: str = "reddit") -> str:
    import scipy.sparse as sp

    gpath = os.path.join(src, "reddit_graph.npz")
    dpath = os.path.join(src, "reddit_data.npz")
    adj = sp.load_npz(gpath).tocoo()
    d = np.load(dpath)
    types = d["node_types"]
    out = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(
        out,
        rows=adj.row.astype(np.int32),
        cols=adj.col.astype(np.int32),
        features=d["feature"].astype(np.float32),
        labels=d["label"].astype(np.int32),
        train_mask=types == 1,
        val_mask=types == 2,
        test_mask=types == 3,
    )
    return out


def convert_ogbn(src: str, out_dir: str, name: str) -> str:
    edges = _read_csv_gz(os.path.join(src, "edge.csv.gz"), np.int64)
    feats = _read_csv_gz(os.path.join(src, "node-feat.csv.gz"), np.float32)
    labels = _read_csv_gz(os.path.join(src, "node-label.csv.gz"), np.int64)
    n = feats.shape[0]
    masks = {}
    split_root = os.path.join(os.path.dirname(src.rstrip("/")), "split")
    if os.path.isdir(split_root):
        sub = os.path.join(split_root, sorted(os.listdir(split_root))[0])
        for k, fn in (("train_mask", "train"), ("val_mask", "valid"),
                      ("test_mask", "test")):
            p = os.path.join(sub, f"{fn}.csv.gz")
            if os.path.exists(p):
                idx = _read_csv_gz(p, np.int64).reshape(-1)
                m = np.zeros(n, bool)
                m[idx] = True
                masks[k] = m
    out = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(
        out,
        rows=edges[:, 0].astype(np.int32),
        cols=edges[:, 1].astype(np.int32),
        features=feats,
        labels=labels.reshape(-1).astype(np.int32),
        **masks,
    )
    return out


def convert_ogbg(src: str, out_dir: str, name: str) -> str:
    edges = _read_csv_gz(os.path.join(src, "edge.csv.gz"), np.int64)
    nn = _read_csv_gz(os.path.join(src, "num-node-list.csv.gz"), np.int64).reshape(-1)
    ne = _read_csv_gz(os.path.join(src, "num-edge-list.csv.gz"), np.int64).reshape(-1)
    nf = _read_csv_gz(os.path.join(src, "node-feat.csv.gz"), np.int64)
    gl = _read_csv_gz(os.path.join(src, "graph-label.csv.gz"), np.float64)
    graphs, feats = [], []
    eo = no = 0
    for g in range(len(nn)):
        e = edges[eo : eo + ne[g]]
        graphs.append((e[:, 0].astype(np.int32), e[:, 1].astype(np.int32),
                       int(nn[g])))
        feats.append(nf[no : no + nn[g]])
        eo += ne[g]
        no += nn[g]
    out = os.path.join(out_dir, f"{name}_batched.npz")
    labels = gl.reshape(len(nn), -1)
    if labels.shape[1] == 1:
        labels = labels.reshape(-1)
    np.savez_compressed(
        out,
        graphs=np.asarray(
            [(g[0], g[1], g[2]) for g in graphs], dtype=object),
        node_features=np.asarray(feats, dtype=object),
        labels=labels,
        allow_pickle=True,
    )
    return out


def convert_coo(src: str, out_dir: str, name: str) -> str:
    arrs = {}
    for k in ("rows", "cols", "features", "labels"):
        arrs[k] = np.load(os.path.join(src, f"{k}.npy"))
    for k in ("train_mask", "val_mask", "test_mask"):
        p = os.path.join(src, f"{k}.npy")
        if os.path.exists(p):
            arrs[k] = np.load(p)
    out = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(out, **arrs)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", help="reddit | ogbn-<x> | ogbg-<x> | coo")
    ap.add_argument("--src", required=True, help="source artifact directory")
    ap.add_argument("--out", default="data", help="output data dir")
    ap.add_argument("--name", default=None,
                    help="target dataset name (default: derived)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    ds = args.dataset
    if ds == "reddit":
        out = convert_reddit(args.src, args.out, args.name or "reddit")
    elif ds.startswith("ogbn-"):
        out = convert_ogbn(args.src, args.out,
                           args.name or ds.replace("ogbn-", ""))
    elif ds.startswith("ogbg-"):
        out = convert_ogbg(args.src, args.out, args.name or ds)
    elif ds == "coo":
        if not args.name:
            ap.error("coo conversion needs --name")
        out = convert_coo(args.src, args.out, args.name)
    else:
        ap.error(f"unknown dataset kind {ds!r}")
        return
    print("wrote", out)


if __name__ == "__main__":
    main()
