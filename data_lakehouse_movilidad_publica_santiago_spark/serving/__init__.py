"""Serving layer: the query-API surface over the silver lake."""

from .query_service import (
    QueryFilters,
    SilverLake,
    ensure_data_ready,
    query_demand_by_day_type,
    query_demand_by_mode,
    query_map_points,
    query_overview,
    query_top_boardings,
)

__all__ = [
    "QueryFilters",
    "SilverLake",
    "ensure_data_ready",
    "query_overview",
    "query_demand_by_day_type",
    "query_demand_by_mode",
    "query_top_boardings",
    "query_map_points",
]
