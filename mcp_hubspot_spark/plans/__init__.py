from .predicates import Filter, compile_filter, compile_filter_groups

__all__ = ["Filter", "compile_filter", "compile_filter_groups"]
