import numpy as np
from geot_tpu.graph.datasets import DATASET_SHAPES, synthetic_clustered_graph
from geot_tpu.graph.stream_plan import build_stream_split_host
n_nodes, n_edges, _, _ = DATASET_SHAPES["ogbn-products"]
for mixing in (0.1, 0.3, 0.5):
    d = synthetic_clustered_graph(n_nodes, n_edges, mixing=mixing,
                                  mean_community=2000, power=1.0, seed=0,
                                  name=f"census-{mixing}")
    order = np.argsort(d.dst, kind="stable")
    families, rest_mask, st = build_stream_split_host(  # round-4 API
        d.dst[order], d.src[order], n_nodes, n_nodes, feature_hint=128)
    print(f"mixing={mixing}: accepted={families is not None} "
          f"stream_frac={st.get('stream_frac'):.3f} "
          f"est_hybrid={st.get('est_hybrid_ms'):.0f} all_bat={st.get('est_all_bat_ms'):.0f}")
