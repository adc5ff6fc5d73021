"""Composite dataflow operators (SURVEY §2.4-§2.6 + §7.1 M5 extensions)."""

from .merge import merge_snapshot
from .topk import top_k_per_group

__all__ = ["merge_snapshot", "top_k_per_group"]
