"""Fused-vs-unfused training-metric parity (fast pytest configs).

Reference protocol: train both paths on the same task and compare the end
metric (``DFGNN/script/train/train_gtconv.py:225-227``).  SBM block labels
are learnable, so the accuracies are meaningful (vs the majority baseline),
and the gap isolates the fused kernels' numerics.
"""

import pytest

from dfgnn_tpu.train.parity import run_parity_batched, run_parity_full


def test_parity_batched_flash():
    r = run_parity_batched(seed=0, n_graphs=16, hidden=16, layers=2,
                           steps=60, lr=2e-2)
    # learnable: clearly above the majority-class baseline
    assert r["acc_unfused"] > r["majority_baseline"] + 0.1, r
    assert r["acc_fused"] > r["majority_baseline"] + 0.1, r
    # parity: fused and unfused reach the same metric within noise
    assert r["gap"] < 0.03, r


def test_parity_full_bucket():
    r = run_parity_full(seed=0, n=800, n_blocks=2, avg_deg=12, hidden=16,
                        layers=2, steps=60, lr=2e-2)
    assert r["acc_unfused"] > r["majority_baseline"] + 0.1, r
    assert r["acc_fused"] > r["majority_baseline"] + 0.1, r
    assert r["gap"] < 0.03, r


@pytest.mark.parametrize("conv", ["gat"])
def test_parity_full_gat(conv):
    r = run_parity_full(seed=1, n=800, n_blocks=2, avg_deg=12, hidden=16,
                        layers=2, steps=60, lr=2e-2, conv=conv)
    assert r["acc_fused"] > r["majority_baseline"] + 0.1, r
    assert r["gap"] < 0.03, r
