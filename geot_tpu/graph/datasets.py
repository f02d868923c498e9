"""Dataset loaders and synthetic graph generators.

The reference benchmarks over PyG/OGB datasets (cora…reddit2,
`benchmark/bench_spmm.py:143-144`, `models/utils.py:15-35`). This
environment has no network egress, so we provide: (a) an `.npz` loader for
locally-materialized graphs (same fields OGB/Planetoid dumps carry), and
(b) deterministic synthetic generators whose node/edge counts and degree
skew match the reference datasets, for benchmarking and tests.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "GraphData",
    "load_npz",
    "synthetic_graph",
    "synthetic_classification_graph",
    "DATASET_SHAPES",
    "get_dataset",
]


@dataclasses.dataclass
class GraphData:
    """Host-side graph: COO edges (unsorted), features, labels, splits."""

    src: np.ndarray
    dst: np.ndarray
    num_nodes: int
    edge_weight: Optional[np.ndarray] = None
    x: Optional[np.ndarray] = None
    y: Optional[np.ndarray] = None
    train_mask: Optional[np.ndarray] = None
    val_mask: Optional[np.ndarray] = None
    test_mask: Optional[np.ndarray] = None
    name: str = "graph"

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])


# (num_nodes, num_edges, feat_dim, num_classes) of the reference benchmark
# datasets (`benchmark/bench_spmm.py:143-144` grid), used to size synthetics.
DATASET_SHAPES: Dict[str, Tuple[int, int, int, int]] = {
    "cora": (2708, 10556, 1433, 7),
    "citeseer": (3327, 9104, 3703, 6),
    "pubmed": (19717, 88648, 500, 3),
    "amazon_photo": (7650, 238162, 745, 8),
    "ppi": (44906, 1226368, 50, 121),
    "flickr": (89250, 899756, 500, 7),
    "ogbn-arxiv": (169343, 1166243, 128, 40),
    "ogbl-collab": (235868, 1285465, 128, 2),
    "reddit2": (232965, 23213838, 602, 41),
    "ogbn-products": (2449029, 61859140, 100, 47),
}


def load_npz(path: str) -> GraphData:
    d = np.load(path, allow_pickle=False)
    return GraphData(
        src=d["src"].astype(np.int32),
        dst=d["dst"].astype(np.int32),
        num_nodes=int(d["num_nodes"]),
        edge_weight=d.get("edge_weight"),
        x=d.get("x"),
        y=d.get("y"),
        train_mask=d.get("train_mask"),
        val_mask=d.get("val_mask"),
        test_mask=d.get("test_mask"),
        name=os.path.splitext(os.path.basename(path))[0],
    )


def synthetic_graph(
    num_nodes: int,
    num_edges: int,
    *,
    feat_dim: int = 0,
    num_classes: int = 0,
    power: float = 1.0,
    seed: int = 0,
    name: str = "synthetic",
) -> GraphData:
    """Power-law random graph (preferential-attachment-like degree skew).

    Destination degrees follow ~Zipf(power) like real web/social graphs,
    reproducing the load imbalance the nnz-balanced schedule must handle
    (SURVEY §7 "Power-law imbalance").
    """
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    probs = ranks ** (-power)
    cdf = np.cumsum(probs)
    cdf /= cdf[-1]
    # inverse-CDF sampling (rng.choice with p is O(minutes) at 10M+ draws)
    dst = np.searchsorted(cdf, rng.random(num_edges)).astype(np.int32)
    src = rng.integers(0, num_nodes, size=num_edges, dtype=np.int32)
    x = y = None
    train = val = test = None
    if feat_dim:
        x = rng.standard_normal((num_nodes, feat_dim), dtype=np.float32)
    if num_classes:
        y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
        idx = rng.permutation(num_nodes)
        n_tr, n_va = int(0.6 * num_nodes), int(0.2 * num_nodes)
        train = np.zeros(num_nodes, dtype=bool)
        val = np.zeros(num_nodes, dtype=bool)
        test = np.zeros(num_nodes, dtype=bool)
        train[idx[:n_tr]] = True
        val[idx[n_tr : n_tr + n_va]] = True
        test[idx[n_tr + n_va :]] = True
    return GraphData(
        src=src, dst=dst, num_nodes=num_nodes, x=x, y=y,
        train_mask=train, val_mask=val, test_mask=test, name=name,
    )


def synthetic_classification_graph(
    num_nodes: int,
    num_edges: int,
    num_classes: int,
    *,
    feat_dim: Optional[int] = None,
    homophily: float = 0.9,
    feature_noise: float = 0.5,
    seed: int = 0,
    name: str = "synthetic-cls",
) -> GraphData:
    """Homophilous labeled graph for training-convergence tests: a fraction
    `homophily` of edges connect same-class nodes and features are a noisy
    class one-hot, so GNN neighbor aggregation *adds* signal (the regime
    Planetoid/OGB node-classification graphs live in)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)
    by_class = [np.where(y == c)[0] for c in range(num_classes)]
    dst = rng.integers(0, num_nodes, size=num_edges).astype(np.int32)
    same = rng.random(num_edges) < homophily
    src = np.empty(num_edges, dtype=np.int32)
    rand_src = rng.integers(0, num_nodes, size=num_edges).astype(np.int32)
    for c in range(num_classes):
        sel = same & (y[dst] == c)
        pool = by_class[c]
        if len(pool):
            src[sel] = pool[rng.integers(0, len(pool), size=int(sel.sum()))]
        else:
            src[sel] = rand_src[sel]
    src[~same] = rand_src[~same]
    f = feat_dim or num_classes
    x = feature_noise * rng.standard_normal((num_nodes, f)).astype(np.float32)
    x[:, :num_classes] += np.eye(num_classes, dtype=np.float32)[y]
    idx = rng.permutation(num_nodes)
    n_tr, n_va = int(0.6 * num_nodes), int(0.2 * num_nodes)
    train = np.zeros(num_nodes, dtype=bool)
    val = np.zeros(num_nodes, dtype=bool)
    test = np.zeros(num_nodes, dtype=bool)
    train[idx[:n_tr]] = True
    val[idx[n_tr : n_tr + n_va]] = True
    test[idx[n_tr + n_va :]] = True
    return GraphData(
        src=src, dst=dst, num_nodes=num_nodes, x=x, y=y,
        train_mask=train, val_mask=val, test_mask=test, name=name,
    )


def get_dataset(name: str, data_dir: str = "data", seed: int = 0) -> GraphData:
    """Load `data/{name}.npz` if present; otherwise generate a synthetic
    graph with the real dataset's shape (clearly tagged `synthetic:`)."""
    path = os.path.join(data_dir, f"{name}.npz")
    if os.path.exists(path):
        return load_npz(path)
    if name not in DATASET_SHAPES:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(DATASET_SHAPES)}")
    n, e, f, c = DATASET_SHAPES[name]
    return synthetic_graph(
        n, e, feat_dim=f, num_classes=c, seed=seed, name=f"synthetic:{name}"
    )
