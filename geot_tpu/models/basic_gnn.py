"""Model families: stacked-conv GNNs with norm/act/dropout/JK.

TPU-native counterpart of the reference's `BasicGNN` clone
(`models/basicgnn.py:25-269`) and its model drivers `GCN_GS` / `GIN_GS` /
`GraphSAGE_GS` (`models/gcn.py:26-33`, `models/gin.py`,
`models/graphsage.py`). The stack is: num_layers convs, each followed by
(optional) norm → activation → dropout, jumping-knowledge combination, and
a final dense head when `out_features` differs from hidden.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geot_tpu.graph.structures import Graph
from geot_tpu.models.conv import (
    APPNPConv,
    GATConv,
    GCNConv,
    GINConv,
    SAGEConv,
    SGConv,
)

__all__ = ["BasicGNN", "GCN", "GIN", "GraphSAGE", "GAT", "SGC", "APPNP", "MODELS"]


class BasicGNN(nn.Module):
    """Generic conv stack (reference `models/basicgnn.py:25-264`).

    conv_cls: one of the conv modules from `geot_tpu.models.conv`.
    jk: None | 'last' | 'cat' | 'max' (reference `basicgnn.py:140-156`).
    """

    hidden_features: int
    num_layers: int
    conv_cls: type = GCNConv
    out_features: Optional[int] = None
    conv_kwargs: Optional[Dict[str, Any]] = None
    act: Callable = nn.relu
    dropout_rate: float = 0.0
    norm: Optional[str] = None  # None | 'layer' | 'batch'
    jk: Optional[str] = None
    act_first: bool = False
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. jnp.bfloat16)

    def _make_conv(self, features: int) -> nn.Module:
        kw = dict(self.conv_kwargs or {})
        kw.setdefault("backend", self.backend)
        kw.setdefault("param_dtype", self.param_dtype)
        kw.setdefault("dtype", self.dtype)
        return self.conv_cls(features=features, **kw)

    def _norm(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.norm == "layer":
            return nn.LayerNorm(param_dtype=self.param_dtype)(x)
        if self.norm == "batch":
            return nn.BatchNorm(
                use_running_average=deterministic, param_dtype=self.param_dtype
            )(x)
        return x

    @nn.compact
    def __call__(
        self, x: jax.Array, graph: Graph, *, deterministic: bool = True
    ) -> jax.Array:
        out_dim = self.out_features or self.hidden_features
        xs = []
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            # last layer keeps hidden width when JK concatenates; otherwise
            # it maps straight to out_dim (reference basicgnn.py:118-137)
            width = self.hidden_features if (self.jk or not is_last) else out_dim
            x = self._make_conv(width)(x, graph)
            if is_last and self.jk is None:
                break
            if self.act_first:
                x = self.act(x)
            x = self._norm(x, deterministic)
            if not self.act_first:
                x = self.act(x)
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
            if self.jk:
                xs.append(x)
        if self.jk == "cat":
            x = jnp.concatenate(xs, axis=-1)
        elif self.jk == "max":
            x = jnp.max(jnp.stack(xs), axis=0)
        elif self.jk == "last":
            x = xs[-1]
        if self.jk is not None:
            x = nn.Dense(out_dim, param_dtype=self.param_dtype)(x)
        return x


class GCN(BasicGNN):
    """Reference `GCN_GS` (`models/gcn.py:26-33`): GCNConv stack.
    Graph must include self-loops (`prepare_graph(add_self_loops=True)`)."""

    conv_cls: type = GCNConv


class GIN(BasicGNN):
    """Reference `GIN_GS` (`models/gin.py`): GINConv stack, no self-loops."""

    conv_cls: type = GINConv


class GraphSAGE(BasicGNN):
    """Reference `GraphSAGE_GS` (`models/graphsage.py`): SAGEConv stack,
    mean aggregation, no self-loops."""

    conv_cls: type = SAGEConv


class GAT(BasicGNN):
    """GAT via mh_spmm attention (reference compile-test model `gat`,
    `test/compile/testmodels.py`). Self-loops required."""

    conv_cls: type = GATConv


class SGC(nn.Module):
    """Single SGConv model (reference compile-test `sgc`)."""

    hidden_features: int  # unused; kept for MODELS uniformity
    num_layers: int = 2
    out_features: Optional[int] = None
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, graph, *, deterministic: bool = True):
        return SGConv(
            features=self.out_features or self.hidden_features,
            k=self.num_layers,
            backend=self.backend,
            param_dtype=self.param_dtype,
        )(x, graph)


class APPNP(nn.Module):
    """MLP + APPNP propagation (reference compile-test `appnp`)."""

    hidden_features: int
    num_layers: int = 2  # MLP depth
    out_features: Optional[int] = None
    k: int = 10
    alpha: float = 0.1
    dropout_rate: float = 0.0
    backend: str = "auto"
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, graph, *, deterministic: bool = True):
        out_dim = self.out_features or self.hidden_features
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(
                out_dim if last else self.hidden_features,
                param_dtype=self.param_dtype,
            )(x)
            if not last:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return APPNPConv(k=self.k, alpha=self.alpha, backend=self.backend)(x, graph)


# name → (model class, needs_self_loops) — the reference's testmodels matrix
# (`test/compile/testmodels.py:3-25`: appnp, gat, gcn, gin, graphsage, sgc).
MODELS = {
    "gcn": (GCN, True),
    "gin": (GIN, False),
    "graphsage": (GraphSAGE, False),
    "gat": (GAT, True),
    "sgc": (SGC, True),
    "appnp": (APPNP, True),
}
