"""Model training/timing CLI — parity with the reference model drivers
(`models/gcn.py:36-60`, `models/gin.py`, `models/graphsage.py`: argparse
over dataset/model/hidden/layers, 100-iteration timing → CSV; plus what
they lack: actual training with accuracy reporting and checkpointing).

  python scripts/train.py --model gcn --dataset cora --hidden 64 \
      --num-layers 2 --epochs 200 --checkpoint ckpt/gcn_cora.npz
  python scripts/train.py --model gcn --dataset flickr --time-only
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from geot_tpu.graph.datasets import get_dataset, synthetic_classification_graph
    from geot_tpu.models import MODELS, prepare_graph, train_node_classifier
    from geot_tpu.utils.timing import timeit

    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=sorted(MODELS), default="gcn")
    p.add_argument("--dataset", default="cora")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--hidden", dest="hidden_channels", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--backend", choices=["auto", "pallas", "reference"],
                   default="auto")
    p.add_argument("--time-only", action="store_true",
                   help="skip training; time forward like the reference drivers")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--csv", default="", help="append timing/metrics row")
    args = p.parse_args()

    d = get_dataset(args.dataset, args.data_dir)
    if d.x is None or d.y is None:
        d = synthetic_classification_graph(
            d.num_nodes, d.num_edges, 8, feat_dim=64, name=d.name
        )
    model_cls, needs_loops = MODELS[args.model]
    graph = prepare_graph(
        d.src, d.dst, d.num_nodes,
        add_self_loops=needs_loops,
        normalize="gcn" if args.model in ("gcn", "sgc", "appnp") else None,
        feature_hint=args.hidden_channels,
    )
    n_cls = int(d.y.max()) + 1
    kwargs = dict(
        hidden_features=args.hidden_channels,
        num_layers=args.num_layers,
        out_features=n_cls,
        backend=args.backend,
    )
    if args.dropout and hasattr(model_cls, "dropout_rate"):
        kwargs["dropout_rate"] = args.dropout
    model = model_cls(**kwargs)
    x = jnp.asarray(d.x.astype(np.float32))

    row = dict(model=args.model, dataset=d.name, hidden=args.hidden_channels,
               layers=args.num_layers, backend=args.backend)
    if args.time_only:
        params = model.init(jax.random.PRNGKey(0), x, graph)
        fn = jax.jit(lambda p, xx, g: model.apply(p, xx, g))
        t = timeit(fn, params, x, graph, warmup=10, iters=args.iters)
        row["fwd_ms"] = round(t * 1e3, 4)
        print(row)
    else:
        params, metrics = train_node_classifier(
            model, graph, x, jnp.asarray(d.y.astype(np.int32)),
            jnp.asarray(d.train_mask), jnp.asarray(d.val_mask),
            jnp.asarray(d.test_mask),
            epochs=args.epochs, lr=args.lr, weight_decay=args.weight_decay,
            log_every=50, checkpoint_path=args.checkpoint or None,
        )
        row.update({k: round(v, 4) for k, v in metrics.items()})
        print(row)
    if args.csv:
        hdr = not os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if hdr:
                w.writeheader()
            w.writerow(row)


if __name__ == "__main__":
    main()
