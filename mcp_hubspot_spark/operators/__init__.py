from .scans import filtered_scan, recent_scan
from .topk import top_k

__all__ = ["filtered_scan", "recent_scan", "top_k"]
