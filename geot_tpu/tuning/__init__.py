from geot_tpu.tuning.heuristics import KernelConfig, select_config, load_table

__all__ = ["KernelConfig", "select_config", "load_table"]
