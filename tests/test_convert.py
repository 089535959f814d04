"""Dataset converter: synthesize standard artifacts in tmp dirs, convert,
and load through the native npz loaders (``scripts/convert_dataset.py``)."""

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import convert_dataset as cv  # noqa: E402

from dfgnn_tpu.data.datasets import load_batched, load_full_graph  # noqa: E402


def _write_csv_gz(path, arr):
    with gzip.open(path, "wt") as f:
        np.savetxt(f, np.atleast_2d(arr), delimiter=",", fmt="%g")


def test_convert_reddit_style(tmp_path, rng):
    import scipy.sparse as sp

    n, e = 50, 400
    adj = sp.coo_matrix(
        (np.ones(e), (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n)).tocsr()
    sp.save_npz(tmp_path / "reddit_graph.npz", adj)
    types = rng.integers(1, 4, size=n)
    np.savez(tmp_path / "reddit_data.npz",
             feature=rng.standard_normal((n, 16)).astype(np.float32),
             label=rng.integers(0, 5, size=n),
             node_types=types)
    out = cv.convert_reddit(str(tmp_path), str(tmp_path))
    assert os.path.exists(out)
    ds = load_full_graph("reddit", str(tmp_path))
    assert not ds.synthetic
    assert ds.n_nodes == n and ds.features.shape == (n, 16)
    assert ds.train_mask.sum() == (types == 1).sum()


def test_convert_ogbn_style(tmp_path, rng):
    raw = tmp_path / "raw"
    raw.mkdir()
    n, e = 40, 200
    _write_csv_gz(raw / "edge.csv.gz",
                  np.stack([rng.integers(0, n, e), rng.integers(0, n, e)], 1))
    _write_csv_gz(raw / "node-feat.csv.gz", rng.standard_normal((n, 8)))
    _write_csv_gz(raw / "node-label.csv.gz",
                  rng.integers(0, 4, size=(n, 1)))
    split = tmp_path / "split" / "time"
    split.mkdir(parents=True)
    _write_csv_gz(split / "train.csv.gz", np.arange(0, 20)[:, None])
    _write_csv_gz(split / "test.csv.gz", np.arange(30, 40)[:, None])
    out = cv.convert_ogbn(str(raw), str(tmp_path), "arxiv")
    assert os.path.exists(out)
    ds = load_full_graph("arxiv", str(tmp_path))
    assert not ds.synthetic
    assert ds.n_nodes == n and ds.n_edges == e
    assert ds.train_mask.sum() == 20 and ds.test_mask.sum() == 10


def test_convert_ogbg_style(tmp_path, rng):
    raw = tmp_path / "raw"
    raw.mkdir()
    nn = np.array([5, 7, 6])
    ne = np.array([8, 10, 9])
    edges = np.concatenate(
        [np.stack([rng.integers(0, k, m), rng.integers(0, k, m)], 1)
         for k, m in zip(nn, ne)])
    _write_csv_gz(raw / "edge.csv.gz", edges)
    _write_csv_gz(raw / "num-node-list.csv.gz", nn[:, None])
    _write_csv_gz(raw / "num-edge-list.csv.gz", ne[:, None])
    _write_csv_gz(raw / "node-feat.csv.gz",
                  rng.integers(0, 3, size=(int(nn.sum()), 9)))
    _write_csv_gz(raw / "graph-label.csv.gz", np.array([[0], [1], [0]]))
    out = cv.convert_ogbg(str(raw), str(tmp_path), "ogbg-molhiv")
    assert os.path.exists(out)
    ds = load_batched("ogbg-molhiv", str(tmp_path))
    assert not ds.synthetic
    assert len(ds) == 3
    assert ds.graphs[1][2] == 7
    assert ds.node_features[2].shape == (6, 9)
