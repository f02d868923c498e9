"""Graph preprocessing cache: save/load a built `Graph` as .npz + JSON.

Products-scale host preprocessing (sorts, plan construction) takes minutes;
the plans are pure functions of (edges, tile shapes), so they are computed
once and reloaded thereafter — the same amortization contract as the
reference's one-time `coo_to_csr` transform (`format_transform.py:5-40`),
extended to the whole plan set. Pickle-free on purpose (cf. the checkpoint
format, `models/train.py`): arrays go to a single .npz, static metadata to
a JSON sidecar entry inside it, and dataclasses are rebuilt structurally.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from geot_tpu.graph.plan import BatPlan, BucketedBatPlan, SegmentPlan

# bump when the plan-building logic changes in a way that invalidates
# cached graphs (e.g. the packedness-honoring fix, round 5)
PLAN_CACHE_VERSION = 2
from geot_tpu.graph.stream_plan import HybridPlan, StreamPlan
from geot_tpu.graph.structures import Graph

__all__ = ["save_graph", "load_graph", "cached_build"]

_PLAN_TYPES = {
    "SegmentPlan": SegmentPlan,
    "BatPlan": BatPlan,
    "BucketedBatPlan": BucketedBatPlan,
    "StreamPlan": StreamPlan,
}
# bump when plan array layouts OR plan-selection policy change — stale
# caches miss and rebuild. (v2: hybrid stream+gather plans added; v3: the
# stream-split margin gate — v2-era caches may carry hyb plans the current
# policy rejects, e.g. arxiv-scale uniform graphs where hybrid measured 2x
# slower than pure BAT; v4: per-cell tile-size stream families +
# aliased-carry execution — coverage tiles and chunk-local windows are
# gone, so v3 single-plan hyb layouts no longer run.)
FORMAT_VERSION = 5  # v5: BatPlan.chunk_vblocks (fast-emitter span gathers)


def _split_fields(obj):
    arrays, statics = {}, {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if f.metadata.get("static"):
            statics[f.name] = v
        elif v is not None:
            arrays[f.name] = np.asarray(v)
    return arrays, statics


def save_graph(g: Graph, path: str) -> None:
    """Write `g` (all plan families, weights, statics) to one .npz."""
    blobs = {}
    meta = {"__version__": FORMAT_VERSION, "plans": {}, "statics": {}}
    for f in dataclasses.fields(Graph):
        v = getattr(g, f.name)
        if v is None:
            continue
        if f.metadata.get("static"):
            meta["statics"][f.name] = v
        elif isinstance(v, (SegmentPlan, BatPlan, BucketedBatPlan, StreamPlan)):
            arrays, statics = _split_fields(v)
            # json serializes nested tuples as arrays; load re-tuplifies
            meta["plans"][f.name] = {
                "type": type(v).__name__,
                "statics": statics,
            }
            for k, a in arrays.items():
                blobs[f"{f.name}.{k}"] = a
        elif isinstance(v, HybridPlan):
            spec = {"type": "HybridPlan", "children": {}}
            for cf in dataclasses.fields(HybridPlan):
                cv = getattr(v, cf.name)
                if cv is None:
                    continue
                if isinstance(cv, tuple):  # stream families (round-4)
                    items = []
                    for idx, el in enumerate(cv):
                        arrays, statics = _split_fields(el)
                        items.append(
                            {"type": type(el).__name__, "statics": statics}
                        )
                        for k, a in arrays.items():
                            blobs[f"{f.name}.{cf.name}.{idx}.{k}"] = a
                    spec["children"][cf.name] = {
                        "type": "tuple", "items": items
                    }
                elif isinstance(cv, (StreamPlan, BatPlan)):
                    arrays, statics = _split_fields(cv)
                    spec["children"][cf.name] = {
                        "type": type(cv).__name__,
                        "statics": statics,
                    }
                    for k, a in arrays.items():
                        blobs[f"{f.name}.{cf.name}.{k}"] = a
                else:
                    blobs[f"{f.name}.{cf.name}"] = np.asarray(cv)
            meta["plans"][f.name] = spec
        else:
            blobs[f.name] = np.asarray(v)
    blobs["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez(fh, **blobs)
    os.replace(tmp, path)


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def load_graph(path: str) -> Optional[Graph]:
    """Rebuild a Graph saved by `save_graph`, or None on version mismatch."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        if meta.get("__version__") != FORMAT_VERSION:
            return None
        kwargs = dict(meta["statics"])
        plan_arrays: dict = {}
        for key in z.files:
            if key == "__meta__":
                continue
            if "." in key:
                fname, k = key.split(".", 1)
                plan_arrays.setdefault(fname, {})[k] = z[key]
            else:
                kwargs[key] = jnp.asarray(z[key])
        def _build_plan(cls, statics, arrays):
            statics = {k: _tuplify(v) for k, v in statics.items()}
            arrays = {k: jnp.asarray(a) for k, a in arrays.items()}
            # absent optional array fields -> None
            for f in dataclasses.fields(cls):
                if not f.metadata.get("static") and f.name not in arrays:
                    arrays[f.name] = None
            return cls(**arrays, **statics)

        for fname, spec in meta["plans"].items():
            if spec["type"] == "HybridPlan":
                flat = plan_arrays.get(fname, {})
                kids: dict = {}
                for cname, cspec in spec["children"].items():
                    sub = {
                        k.split(".", 1)[1]: a
                        for k, a in flat.items()
                        if k.startswith(cname + ".")
                    }
                    if cspec["type"] == "tuple":  # stream families
                        kids[cname] = tuple(
                            _build_plan(
                                _PLAN_TYPES[ispec["type"]],
                                ispec["statics"],
                                {
                                    k.split(".", 1)[1]: a
                                    for k, a in sub.items()
                                    if k.startswith(f"{idx}.")
                                },
                            )
                            for idx, ispec in enumerate(cspec["items"])
                        )
                    else:
                        kids[cname] = _build_plan(
                            _PLAN_TYPES[cspec["type"]], cspec["statics"], sub
                        )
                for cf in dataclasses.fields(HybridPlan):
                    if cf.name in kids:
                        continue
                    kids[cf.name] = (
                        jnp.asarray(flat[cf.name]) if cf.name in flat else None
                    )
                kwargs[fname] = HybridPlan(**kids)
            else:
                kwargs[fname] = _build_plan(
                    _PLAN_TYPES[spec["type"]], spec["statics"],
                    plan_arrays.get(fname, {}),
                )
    return Graph(**kwargs)


def cached_build(cache_key: str, build_fn, cache_dir: Optional[str] = None):
    """Load the graph for `cache_key` from the cache, or build via
    `build_fn()` and save. Cache dir defaults to ~/.cache/geot_tpu/graphs
    (override: GEOT_GRAPH_CACHE_DIR; disable: GEOT_GRAPH_CACHE_DIR=off)."""
    cache_dir = cache_dir or os.environ.get(
        "GEOT_GRAPH_CACHE_DIR",
        os.path.expanduser("~/.cache/geot_tpu/graphs"),
    )
    if cache_dir == "off":
        return build_fn()
    # plans embed tuning-table decisions (tiles, packedness, layout
    # preference), so the key must roll over when the table or the plan
    # format changes — otherwise a re-sweep keeps serving stale plans
    from geot_tpu.tuning.heuristics import table_fingerprint

    path = os.path.join(
        cache_dir, f"{cache_key}-v{PLAN_CACHE_VERSION}-{table_fingerprint()}.npz"
    )
    if os.path.exists(path):
        try:
            g = load_graph(path)
            if g is not None:
                return g
        except Exception:
            pass  # corrupt/stale cache: rebuild
    g = build_fn()
    try:
        save_graph(g, path)
    except Exception:
        pass  # cache write failure must not break the build
    return g
