from .pack import (
    chunk_pack,
    chunk_pack_g,
    rearrange_perm,
    stride_chunks,
    unstride_chunks,
)

__all__ = [
    "chunk_pack",
    "chunk_pack_g",
    "rearrange_perm",
    "stride_chunks",
    "unstride_chunks",
]
