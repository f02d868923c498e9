"""Training loop, evaluation, and checkpointing for node classification.

The reference only *times* its models (`models/gcn.py:55-60` — no optimizer,
no checkpoint anywhere; SURVEY §5 "Checkpoint / resume: none"). The TPU
framework's accuracy targets (BASELINE.md: GCN accuracy parity on
OGB/Planetoid) require real training, so this module supplies an optax
train step, full-graph evaluation, and orbax-free pytree checkpointing.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geot_tpu.graph.structures import Graph

__all__ = [
    "cross_entropy_loss",
    "accuracy",
    "make_train_step",
    "train_node_classifier",
    "save_checkpoint",
    "load_checkpoint",
]


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, mask: jax.Array
) -> jax.Array:
    """Masked mean softmax cross-entropy over the train split."""
    ls = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(ls, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def accuracy(logits: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels).astype(jnp.float32) * m) / jnp.maximum(
        jnp.sum(m), 1.0
    )


def make_train_step(model, tx: optax.GradientTransformation, *, has_dropout: bool):
    """Returns a jitted (params, opt_state, rng, x, graph, y, mask) step."""

    @jax.jit
    def step(params, opt_state, rng, x, graph, y, mask):
        rng, drop_rng = jax.random.split(rng)

        def loss_fn(p):
            kwargs = {"deterministic": False} if has_dropout else {}
            rngs = {"dropout": drop_rng} if has_dropout else {}
            logits = model.apply(p, x, graph, rngs=rngs, **kwargs)
            return cross_entropy_loss(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return step


@partial(jax.jit, static_argnums=(0,))
def _eval(model, params, x, graph, y, masks):
    logits = model.apply(params, x, graph)
    return tuple(accuracy(logits, y, m) for m in masks)


def train_node_classifier(
    model,
    graph: Graph,
    x: jax.Array,
    y: jax.Array,
    train_mask: jax.Array,
    val_mask: Optional[jax.Array] = None,
    test_mask: Optional[jax.Array] = None,
    *,
    epochs: int = 200,
    lr: float = 0.01,
    weight_decay: float = 5e-4,
    seed: int = 0,
    log_every: int = 0,
    checkpoint_path: Optional[str] = None,
) -> Tuple[Any, Dict[str, float]]:
    """Full-graph training. Returns (params, metrics)."""
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, x, graph)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)
    has_dropout = getattr(model, "dropout_rate", 0.0) > 0.0
    step = make_train_step(model, tx, has_dropout=has_dropout)

    best_val, best_params = -1.0, params
    masks = [train_mask] + [m for m in (val_mask, test_mask) if m is not None]
    loss = jnp.zeros(())
    for epoch in range(epochs):
        params, opt_state, rng, loss = step(
            params, opt_state, rng, x, graph, y, train_mask
        )
        if val_mask is not None and (epoch % 10 == 9 or epoch == epochs - 1):
            accs = _eval(model, params, x, graph, y, tuple(masks))
            if float(accs[1]) > best_val:
                best_val, best_params = float(accs[1]), params
            if log_every and epoch % log_every == log_every - 1:
                print(
                    f"epoch {epoch + 1}: loss={float(loss):.4f} "
                    + " ".join(f"acc{i}={float(a):.4f}" for i, a in enumerate(accs))
                )
    final = best_params if val_mask is not None else params
    accs = _eval(model, final, x, graph, y, tuple(masks))
    metrics = {"loss": float(loss), "train_acc": float(accs[0])}
    if val_mask is not None:
        metrics["val_acc"] = float(accs[1])
    if test_mask is not None:
        metrics["test_acc"] = float(accs[-1])
    if checkpoint_path:
        save_checkpoint(checkpoint_path, final, metrics)
    return final, metrics


def _path_to_json(path) -> list:
    """Key path → JSON-serializable access chain (dict keys / seq indices)."""
    out = []
    for k in path:
        if hasattr(k, "key"):  # DictKey
            out.append(["d", k.key])
        elif hasattr(k, "idx"):  # SequenceKey
            out.append(["s", int(k.idx)])
        elif hasattr(k, "name"):  # GetAttrKey (flax dataclasses etc.)
            out.append(["a", k.name])
        else:
            raise TypeError(f"unsupported pytree key {k!r} for checkpointing")
    return out


def save_checkpoint(path: str, params, metadata: Optional[dict] = None) -> None:
    """Pickle-free pytree checkpoint: leaves as arrays inside an .npz plus a
    JSON manifest of key paths and JSON metadata — loading never unpickles,
    so untrusted checkpoints cannot execute code. Supported containers:
    dicts, lists, tuples (tuples load back as lists)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    manifest = [_path_to_json(p) for p, _ in flat]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        **{f"leaf_{i}": np.asarray(l) for i, (_, l) in enumerate(flat)},
        __paths__=np.frombuffer(
            json.dumps(manifest).encode(), dtype=np.uint8
        ),
        __meta__=np.frombuffer(
            json.dumps(metadata or {}).encode(), dtype=np.uint8
        ),
    )


def load_checkpoint(path: str):
    """Structural (pickle-free) load: rebuilds nested dicts/lists from the
    JSON key-path manifest."""
    d = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
    manifest = json.loads(d["__paths__"].tobytes().decode())
    meta = json.loads(d["__meta__"].tobytes().decode())
    root: Optional[object] = None

    def ensure(container, step, nxt_step):
        kind, key = step
        make = (lambda: {}) if nxt_step is None or nxt_step[0] in ("d", "a") else (lambda: [])
        if kind in ("d", "a"):
            if key not in container:
                container[key] = make() if nxt_step is not None else None
            return container, key
        while len(container) <= key:
            container.append(None)
        if nxt_step is not None and container[key] is None:
            container[key] = make()
        return container, key

    for i, steps in enumerate(manifest):
        leaf = jnp.asarray(d[f"leaf_{i}"])
        if not steps:
            root = leaf
            continue
        if root is None:
            root = {} if steps[0][0] in ("d", "a") else []
        node = root
        for j, step in enumerate(steps):
            nxt = steps[j + 1] if j + 1 < len(steps) else None
            node, key = ensure(node, step, nxt)
            if nxt is None:
                node[key] = leaf
            else:
                node = node[key]
    return root, meta
