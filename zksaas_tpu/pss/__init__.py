from .gao import decode_to_message, partial_xgcd
from .pss import PackedSharingParams, pss

__all__ = ["PackedSharingParams", "pss", "decode_to_message", "partial_xgcd"]
