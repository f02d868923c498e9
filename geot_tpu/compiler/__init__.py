from geot_tpu.compiler.match_replace import pattern_transform, count_matches

__all__ = ["pattern_transform", "count_matches"]
