from .ranker import TaxonomyRanker

__all__ = ["TaxonomyRanker"]
