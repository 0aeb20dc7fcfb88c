"""Relational / streaming-expression operators and training-data
pipeline operators (SURVEY.md §2.1-§2.6 Solr stream family; §2.4
aggregations; plus the dedup / similarity / text-analysis ops a
large-scale training-data pipeline needs)."""

from .streams import (  # noqa: F401
    complement, facet, fetch, group_topk, hash_join, having, inner_join,
    intersect, merge, rank, rollup, select, stats, subfacet, unique,
)
