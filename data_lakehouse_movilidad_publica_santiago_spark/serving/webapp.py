"""HTTP serving tier: FastAPI wrapper over the query service.

Parity with the reference portal API (src/webapp/main.py:22-111):
same endpoints (``/api/health``, ``/api/query``, ``/api/map_points``),
same request validation (limit 1..200 for queries / 1..2000 for map
points, hours 0..23, free-form cut range strings normalized
downstream), same response envelopes. The Leaflet portal's static
assets are out of engine scope; any client of the reference API can
point at this app unchanged.

Structure: the pydantic request models and the ``dispatch`` function
are framework-free (tested without HTTP); ``create_app`` binds them
to FastAPI and is import-gated — this container has no fastapi, so
the gate raises with install guidance, exactly like the xlsb source
gate (sources/bronze.py).

Scale note: each request compiles to a pushed-down, partition-pruned
DataFrame plan over the silver lake (see query_service docstrings);
the HTTP layer adds no per-row Python work.
"""

from __future__ import annotations

from enum import Enum
from typing import Any

from pydantic import BaseModel, Field

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


class QueryType(str, Enum):
    OVERVIEW = "overview"
    DEMAND_BY_DAY_TYPE = "demand_by_day_type"
    DEMAND_BY_MODE = "demand_by_mode"
    TOP_BOARDINGS = "top_boardings"


class UserQueryRequest(BaseModel):
    """Mirror of the reference's request model (main.py:29-37):
    bounded limit, 0-23 hour window, list filters default-empty."""

    query_type: QueryType
    cut_from: str | None = None
    cut_to: str | None = None
    tipo_dia: list[str] = Field(default_factory=list)
    mode: list[str] = Field(default_factory=list)
    hour_from: int | None = Field(default=None, ge=0, le=23)
    hour_to: int | None = Field(default=None, ge=0, le=23)
    limit: int = Field(default=20, ge=1, le=200)


class UserQueryResponse(BaseModel):
    query_type: QueryType
    rows: list[dict]
    row_count: int


class MapPointsRequest(BaseModel):
    """main.py:45-53: map extract allows a larger cap (≤2000)."""

    cut_from: str | None = None
    cut_to: str | None = None
    tipo_dia: list[str] = Field(default_factory=list)
    mode: list[str] = Field(default_factory=list)
    hour_from: int | None = Field(default=None, ge=0, le=23)
    hour_to: int | None = Field(default=None, ge=0, le=23)
    limit: int = Field(default=400, ge=1, le=2000)


def _filters(payload: UserQueryRequest | MapPointsRequest) -> QueryFilters:
    return QueryFilters(
        cut_from=payload.cut_from,
        cut_to=payload.cut_to,
        tipo_dia=payload.tipo_dia,
        mode=payload.mode,
        hour_from=payload.hour_from,
        hour_to=payload.hour_to,
    )


def dispatch(lake: SilverLake, payload: UserQueryRequest) -> UserQueryResponse:
    """Route a validated query request to the query service
    (main.py:80-105 parity). Framework-free so endpoint logic is
    testable without HTTP."""
    f = _filters(payload)
    if payload.query_type == QueryType.OVERVIEW:
        rows = query_overview(lake, f)
    elif payload.query_type == QueryType.DEMAND_BY_DAY_TYPE:
        rows = query_demand_by_day_type(lake, f)
    elif payload.query_type == QueryType.DEMAND_BY_MODE:
        rows = query_demand_by_mode(lake, f)
    else:
        rows = query_top_boardings(lake, f, limit=payload.limit)
    return UserQueryResponse(
        query_type=payload.query_type, rows=rows, row_count=len(rows)
    )


def dispatch_map_points(
    lake: SilverLake, payload: MapPointsRequest
) -> dict[str, Any]:
    points = query_map_points(lake, _filters(payload), limit=payload.limit)
    return {"point_count": len(points), "points": points}


def create_app(lake: SilverLake):
    """Build the FastAPI app over an opened SilverLake.

    Requires ``fastapi`` (not in this container): install
    ``fastapi`` + ``uvicorn`` and run
    ``uvicorn your_module:app`` with
    ``app = create_app(SilverLake(spark, lake_root))``.
    """
    try:
        from fastapi import FastAPI, HTTPException
    except ImportError as exc:  # pragma: no cover - env-gated
        raise ImportError(
            "fastapi is required for the HTTP serving tier: "
            "pip install fastapi uvicorn"
        ) from exc

    app = FastAPI(
        title="Movilidad Santiago Query API (Spark)",
        version="1.0.0",
        description="API de consultas sobre la capa Silver (PySpark engine)",
    )

    def _ready() -> None:
        if not ensure_data_ready(lake):
            raise HTTPException(
                status_code=503,
                detail=(
                    "No hay datos Silver disponibles. "
                    "Ejecuta el pipeline primero."
                ),
            )

    @app.get("/api/health")
    def health() -> dict:
        return {"status": "ok", "data_ready": ensure_data_ready(lake)}

    @app.post("/api/query", response_model=UserQueryResponse)
    def query_endpoint(payload: UserQueryRequest) -> UserQueryResponse:
        _ready()
        return dispatch(lake, payload)

    @app.post("/api/map_points")
    def map_points_endpoint(payload: MapPointsRequest) -> dict:
        _ready()
        return dispatch_map_points(lake, payload)

    return app
