from .table import LakeTable, MergeStats

__all__ = ["LakeTable", "MergeStats"]
