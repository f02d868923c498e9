from geot_tpu.utils.timing import timeit
from geot_tpu.utils.roofline import spmm_bytes, hbm_bandwidth_gbps, roofline_fraction

__all__ = ["timeit", "spmm_bytes", "hbm_bandwidth_gbps", "roofline_fraction"]
