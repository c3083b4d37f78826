from .dml import delete_where, update_where
from .forget import forget_keys
from .fsck import fsck
from .reconcile import reconcile, snapshot_diff
from .table import LakeTable, MergeStats
from .transaction import Catalog, Transaction, TransactionAborted

__all__ = [
    "LakeTable",
    "MergeStats",
    "Catalog",
    "Transaction",
    "TransactionAborted",
    "reconcile",
    "snapshot_diff",
    "delete_where",
    "update_where",
    "forget_keys",
    "fsck",
]
