from .scalars import (
    classify_sender,
    coalesce_body,
    iso_format,
    similarity_from_distance,
    truncate_text,
)

__all__ = [
    "classify_sender",
    "coalesce_body",
    "iso_format",
    "similarity_from_distance",
    "truncate_text",
]
