"""string_grouper_ray — a Ray-Data-native near-duplicate detection and
clustering engine with the query capabilities of Bergvca/string_grouper.

Public API (reference-compatible pandas surface, backed by Ray Data):

    match_strings, match_most_similar, group_similar_strings,
    compute_pairwise_similarities, RayStringGrouper

Dataset-level pipelines (the scale path) live in
``string_grouper_ray.pipelines`` and operate on ``ray.data.Dataset`` with
``row_idx``/``text`` columns.
"""

from .compat import (
    RayStringGrouper,
    StringGrouperNotFitException,
    compute_pairwise_similarities,
    group_similar_strings,
    match_most_similar,
    match_strings,
)
from .config import EngineConfig
from .sparse import Vocabulary

StringGrouper = RayStringGrouper  # reference alias
StringGrouperConfig = EngineConfig  # reference alias (frozen, same defaults)

__all__ = [
    "EngineConfig",
    "RayStringGrouper",
    "StringGrouper",
    "StringGrouperConfig",
    "StringGrouperNotFitException",
    "Vocabulary",
    "compute_pairwise_similarities",
    "group_similar_strings",
    "match_most_similar",
    "match_strings",
]
