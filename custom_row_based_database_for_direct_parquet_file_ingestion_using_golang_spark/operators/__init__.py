from .query import Query, agg_spec

__all__ = ["Query", "agg_spec"]
