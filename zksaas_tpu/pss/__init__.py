from .pss import PackedSharingParams, pss

__all__ = ["PackedSharingParams", "pss"]
