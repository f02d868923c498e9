"""Pattern-match-and-replace compiler pass over jaxprs.

TPU-native counterpart of GeoT's torch.export/FX graph pass
(`geot/match_replace/match_replace.py:8-33`): the reference scans an
exported FX graph for `index_select → mul → index_add` message-passing
subgraphs and splices in fused GeoT ops before `torch.compile`
(`fused_gs.py`, `fused_gws.py`, `fused_mh_spmm.py`). Here the traced IR is
the jaxpr: `pattern_transform(fn, graph)` wraps a user function written in
plain jnp — `out.at[dst].add(x[src] * w[:, None])`,
`jax.ops.segment_sum(x[src], dst, n)`, or the 3-D multi-head variant —
and re-evaluates its jaxpr with every matched `scatter-add` replaced by the
corresponding fused Pallas op over the prebuilt `Graph` plan. The now-dead
gather/mul producers are left to XLA's DCE (the reference calls
`eliminate_dead_code()` explicitly, `match_replace.py:29`).

Contract (same as the reference pass, which trusts the FX graph's
`edge_index` to be the tensors the replacement ops receive): the traced
src/dst index arrays must be the `graph`'s own dst-sorted edge arrays.
Patterns whose output row count differs from `graph.num_nodes` are left
untouched.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax import core

try:  # jax >= 0.6 moved jaxpr types
    from jax.extend import core as ext_core

    Literal = ext_core.Literal
except Exception:  # pragma: no cover
    Literal = core.Literal  # type: ignore[attr-defined]

from geot_tpu.graph.structures import Graph
from geot_tpu.ops import api as ops

__all__ = ["pattern_transform", "count_matches"]

_PASSTHROUGH = {
    "reshape",
    "broadcast_in_dim",
    "convert_element_type",
    "squeeze",
    "copy",
}


class _Rewriter:
    def __init__(self, jaxpr: core.Jaxpr, graph: Graph, backend: str):
        self.jaxpr = jaxpr
        self.graph = graph
        self.backend = backend
        self.producer: Dict[Any, Any] = {}
        for eqn in jaxpr.eqns:
            for v in eqn.outvars:
                self.producer[v] = eqn
        self.matches = 0

    # -- helpers -----------------------------------------------------------
    def _origin(self, var, env):
        """Walk back through shape-only ops to the semantic source var and
        return (root_var, value)."""
        seen = 0
        while not isinstance(var, Literal) and var in self.producer and seen < 8:
            eqn = self.producer[var]
            if eqn.primitive.name in _PASSTHROUGH:
                var = eqn.invars[0]
                seen += 1
            else:
                break
        return var

    def _prod(self, var):
        if isinstance(var, Literal):
            return None
        return self.producer.get(var)

    def _match_scatter(self, eqn, env):
        """Return the fused-op value for a matched scatter-add, else None."""
        if eqn.primitive.name not in ("scatter-add", "scatter_add"):
            return None
        operand_v, indices_v, updates_v = eqn.invars[:3]
        n_out = operand_v.aval.shape[0]
        if n_out != self.graph.num_nodes:
            return None
        # the scatter's base operand: the fused op replaces the whole
        # scatter, so the base must be added back (user code like
        # `x.at[dst].add(x[src])` has a non-zero base; for the common
        # zeros-broadcast base XLA folds the add away)
        base = env(operand_v)
        if base is None:
            return None
        # destination indices: [nnz] (via reshape to [nnz, 1])
        idx_root = self._origin(indices_v, env)
        dst = env(idx_root)
        if dst is None or dst.ndim != 1:
            return None
        nnz = dst.shape[0]
        if nnz != self.graph.num_edges:
            return None

        # updates chain: gather(x, src) possibly times a weight
        up_root = self._origin(updates_v, env)
        up_eqn = self._prod(up_root)
        if up_eqn is None:
            return None
        weight = None
        if up_eqn.primitive.name == "mul":
            a, b = up_eqn.invars
            ga = self._gather_parts(a, env)
            gb = self._gather_parts(b, env)
            if ga is not None:
                gathered, other = ga, b
            elif gb is not None:
                gathered, other = gb, a
            else:
                return None
            w_root = self._origin(other, env)
            weight = env(w_root)
            if weight is None:
                return None
            x_val, src = gathered
        elif up_eqn.primitive.name == "gather":
            parts = self._gather_parts(up_root, env)
            if parts is None:
                return None
            x_val, src = parts
            weight = None
        else:
            return None
        if src.shape[0] != nnz:
            return None

        g = self.graph
        if x_val.ndim == 2 and (weight is None or weight.ndim <= 2):
            if weight is None:
                out = ops.gather_scatter(
                    src, dst, x_val, n_out, graph=g, backend=self.backend
                )
            else:
                w1 = weight.reshape(nnz) if weight.size == nnz else None
                if w1 is None:
                    return None
                out = ops.gather_weight_scatter(
                    src, dst, w1, x_val, n_out, graph=g, backend=self.backend
                )
        elif x_val.ndim == 3 and weight is not None:
            # multi-head: weight [nnz, H] (reference fused_mh_spmm pattern)
            H = x_val.shape[1]
            if weight.size != nnz * H:
                return None
            out = ops.mh_spmm(
                src,
                dst,
                weight.reshape(nnz, H),
                x_val,
                n_out,
                graph=g,
                backend=self.backend,
            )
        else:
            return None
        self.matches += 1
        out = out.astype(eqn.outvars[0].aval.dtype) + base.astype(
            eqn.outvars[0].aval.dtype
        )
        return out

    def _gather_parts(self, var, env):
        """If `var` is (a shape-op of) gather(x, idx) with 1-D row indices,
        return (x_value, idx_value)."""
        root = self._origin(var, env)
        eqn = self._prod(root)
        if eqn is None or eqn.primitive.name != "gather":
            return None
        x_v, ind_v = eqn.invars[:2]
        x_val = env(x_v)
        idx = env(self._origin(ind_v, env))
        if x_val is None or idx is None:
            return None
        if idx.ndim == 2 and idx.shape[1] == 1:
            idx = idx.reshape(-1)
        if idx.ndim != 1:
            return None
        # row gather only: offset_dims cover all trailing axes
        dn = eqn.params.get("dimension_numbers")
        if dn is not None and tuple(dn.start_index_map) != (0,):
            return None
        return x_val, idx


def _eval_eqn(eqn, sub):
    """Evaluate one eqn, inlining call-style primitives (pjit,
    custom_jvp/vjp, remat) whose params carry an inner jaxpr — naive
    `bind` needs the callable args that only the tracing machinery has."""
    name = eqn.primitive.name
    inner = None
    if name in ("pjit", "closed_call", "remat2", "checkpoint"):
        inner = eqn.params.get("jaxpr")
    elif name in ("custom_jvp_call", "custom_vjp_call", "custom_lin"):
        inner = eqn.params.get("call_jaxpr")
    if inner is not None:
        if hasattr(inner, "consts"):
            outs = core.eval_jaxpr(inner.jaxpr, inner.consts, *sub)
        else:  # bare Jaxpr
            outs = core.eval_jaxpr(inner, [], *sub)
        return outs if eqn.primitive.multiple_results else outs[0]
    return eqn.primitive.bind(*sub, **eqn.params)


def _eval_rewritten(closed, args_flat, graph: Graph, backend: str, counter):
    jaxpr = closed.jaxpr
    rw = _Rewriter(jaxpr, graph, backend)
    env: Dict[Any, Any] = {}

    def read(v):
        if isinstance(v, Literal):
            return v.val
        return env.get(v)

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, closed.consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args_flat):
        write(v, a)
    for eqn in jaxpr.eqns:
        fused = rw._match_scatter(eqn, read)
        if fused is not None:
            write(eqn.outvars[0], fused)
            continue
        sub = [read(v) for v in eqn.invars]
        ans = _eval_eqn(eqn, sub)
        if eqn.primitive.multiple_results:
            for v, a in zip(eqn.outvars, ans):
                write(v, a)
        else:
            write(eqn.outvars[0], ans)
    if counter is not None:
        counter.append(rw.matches)
    return [read(v) for v in jaxpr.outvars]


def pattern_transform(fn, graph: Graph, *, backend: str = "auto"):
    """Wrap `fn(*args)` so matched gather→(mul)→scatter-add subgraphs run
    through the fused Pallas ops (reference driver:
    `geot/match_replace/match_replace.py:8-33`). The wrapper is jit-able;
    unmatched code evaluates unchanged."""

    def wrapped(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        closed = jax.make_jaxpr(lambda *f: fn(*jax.tree_util.tree_unflatten(in_tree, f)))(
            *flat
        )
        outs = _eval_rewritten(closed, flat, graph, backend, None)
        return outs[0] if len(outs) == 1 else tuple(outs)

    return wrapped


def count_matches(fn, graph: Graph, *example_args, backend: str = "reference") -> int:
    """How many scatter-adds the pass would fuse for these example args
    (testing/diagnostics — the analogue of the reference printing the
    rewritten FX code, `test/compile/test_gcn.py:30`)."""
    flat, in_tree = jax.tree_util.tree_flatten(example_args)
    closed = jax.make_jaxpr(
        lambda *f: fn(*jax.tree_util.tree_unflatten(in_tree, f))
    )(*flat)
    counter: list = []
    _eval_rewritten(closed, flat, graph, backend, counter)
    return counter[0]
