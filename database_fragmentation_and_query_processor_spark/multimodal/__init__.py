"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched pandas iterators
(``mapInPandas``) so bytes never round-trip row-at-a-time. The actual
codec step is stubbed (no media libs in this container) behind
``decode_stub`` — the Spark-side shape (schema, batching, partitioning)
is real and tested.
"""

from .binary_ops import (
    MEDIA_META_SCHEMA,
    decode_stub,
    extract_features,
    with_media_meta,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "decode_stub",
    "extract_features",
    "with_media_meta",
]
