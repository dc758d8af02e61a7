"""Pure-Python batch kernels (no Spark imports).

Each kernel reproduces the observable semantics of the reference
implementation exactly (citations in each module) and is exercised by
the reference's own golden doctest vectors in tests/test_kernel_*.py.
The Spark operators in webstruct_spark.operators call these kernels in
Arrow-batched pandas UDFs, so correctness is pinned here once and the
distributed layer only has to get the plumbing right.
"""

from .tokenize import segment_words, default_segment_words, tokenize_batch
from .bilou import classify_token, encode_tokens, group_tags, decode_mentions
from .smartjoin import smart_join
from .matching import LongestMatcher
from .grouping import (
    block_positions,
    span_distances,
    cluster_by_threshold,
    clustering_score,
    best_clustering,
)

__all__ = [
    "segment_words",
    "default_segment_words",
    "tokenize_batch",
    "classify_token",
    "encode_tokens",
    "group_tags",
    "decode_mentions",
    "smart_join",
    "LongestMatcher",
    "block_positions",
    "span_distances",
    "cluster_by_threshold",
    "clustering_score",
    "best_clustering",
]
