"""Vendor tiny REAL graphs into tests/fixtures/*.npz via networkx.

Two classic real-world datasets (not synthetic generators):
  - karate.npz — Zachary's Karate Club (34 nodes, 78 edges), node labels =
    the two real factions ("Mr. Hi" / "Officer"); the standard tiny
    semi-supervised node-classification benchmark.
  - lesmis.npz — Les Misérables character co-occurrence network (77 nodes,
    254 weighted edges, Knuth's Stanford GraphBase data).

Fixture schema matches `geot_tpu.graph.datasets.load_npz`
(role of the reference's dataset loader, `models/utils.py:15-55`): directed
edge list is the symmetrized undirected graph, features are degree one-hot
buckets + identity-free (no leakage of labels).
"""

import os

import networkx as nx
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _edges_sym(G, nodes):
    idx = {u: i for i, u in enumerate(nodes)}
    src, dst, w = [], [], []
    for u, v, data in G.edges(data=True):
        wt = float(data.get("weight", 1.0))
        src += [idx[u], idx[v]]
        dst += [idx[v], idx[u]]
        w += [wt, wt]
    return (
        np.asarray(src, np.int32),
        np.asarray(dst, np.int32),
        np.asarray(w, np.float32),
    )


def _degree_features(src, n, buckets=16):
    deg = np.bincount(src, minlength=n).astype(np.int64)
    cap = np.minimum(deg, buckets - 1)
    x = np.zeros((n, buckets), np.float32)
    x[np.arange(n), cap] = 1.0
    x[:, -1] = np.log1p(deg)  # one continuous feature
    return x


def karate():
    G = nx.karate_club_graph()
    nodes = sorted(G.nodes())
    src, dst, _ = _edges_sym(G, nodes)
    n = len(nodes)
    y = np.asarray(
        [0 if G.nodes[u]["club"] == "Mr. Hi" else 1 for u in nodes], np.int32
    )
    # standard semi-supervised split: the two leaders + one extra per side
    train = np.zeros(n, bool)
    train[[0, 33, 5, 24]] = True
    val = np.zeros(n, bool)
    val[[2, 8, 13, 19, 25, 30]] = True
    test = ~(train | val)
    np.savez(
        os.path.join(OUT, "karate.npz"),
        src=src,
        dst=dst,
        num_nodes=n,
        # identity features — the classic GCN karate setup (structure-only
        # learning; degree alone does not separate the factions)
        x=np.eye(n, dtype=np.float32),
        y=y,
        train_mask=train,
        val_mask=val,
        test_mask=test,
    )
    print(f"karate: {n} nodes, {len(src)} directed edges")


def lesmis():
    G = nx.les_miserables_graph()
    nodes = sorted(G.nodes())
    src, dst, w = _edges_sym(G, nodes)
    n = len(nodes)
    np.savez(
        os.path.join(OUT, "lesmis.npz"),
        src=src,
        dst=dst,
        edge_weight=w,
        num_nodes=n,
        x=_degree_features(src, n),
    )
    print(f"lesmis: {n} nodes, {len(src)} directed edges (weighted)")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    karate()
    lesmis()
