"""Real-data digits loader: schema, determinism, multilabel holes.

The digits datasets are REAL data (sklearn's handwritten digits) in the
MNIST-superpixel schema — the accuracy-parity workload of BASELINE.md.
"""

import numpy as np

from dfgnn_tpu.data.collate import collate_dense
from dfgnn_tpu.data.datasets import load_batched


def test_digits_schema():
    ds = load_batched("digits")
    assert not ds.synthetic
    assert len(ds) == 1797
    assert ds.task == "graph_classification"
    assert ds.num_classes == 10
    assert set(np.unique(ds.labels)) == set(range(10))
    for i in (0, 7, 1796):
        r, c, n = ds.graphs[i]
        assert n == 64
        assert len(r) == len(c) > 0
        assert r.max() < 64 and c.max() < 64
        f = ds.node_features[i]
        assert f.shape == (64, 3)
        assert f.dtype == np.float32
        assert 0.0 <= f.min() and f.max() <= 1.0
    # graphs are the per-image ink structure: different images differ
    assert len(ds.graphs[0][0]) != len(ds.graphs[1][0]) or not np.array_equal(
        ds.graphs[0][0], ds.graphs[1][0])


def test_digits_deterministic():
    a = load_batched("digits")
    b = load_batched("digits")
    assert np.array_equal(a.graphs[5][0], b.graphs[5][0])
    assert np.array_equal(a.node_features[5], b.node_features[5])
    assert np.array_equal(a.labels, b.labels)


def test_digits_func_multilabel_holes():
    ds = load_batched("digits-func")
    assert ds.task == "graph_classification_multilabel"
    y = ds.labels
    assert y.shape == (1797, 10)
    nan_frac = np.isnan(y).mean()
    assert 0.15 < nan_frac < 0.25  # deterministic ~20% molpcba-style holes
    # labeled cells are one-vs-all of the real class
    sl = load_batched("digits")
    for i in range(20):
        row = y[i]
        lab = ~np.isnan(row)
        on = np.nonzero(row == 1.0)[0]
        assert all(row[j] in (0.0, 1.0) for j in np.nonzero(lab)[0])
        if lab[sl.labels[i]]:
            assert on.tolist() == [sl.labels[i]]


def test_digits_collates():
    ds = load_batched("digits")
    b, x, y, m = collate_dense(ds, list(range(16)), np_pad=64)
    assert b.n_graphs == 16 and b.np_pad == 64
    assert x.shape == (16 * 64, 3)
    assert y.shape == (16,)
    assert m.all()
