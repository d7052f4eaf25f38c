"""HTTP serving tier: request-model validation (the reference's
main.py:29-53 caps) and framework-free endpoint dispatch over the
fixture lake. fastapi itself is absent in this container — the
create_app import gate is asserted instead; if fastapi ever appears,
the TestClient round-trip runs too."""

from __future__ import annotations

import pytest
from pydantic import ValidationError

from data_lakehouse_movilidad_publica_santiago_spark.serving import SilverLake
from data_lakehouse_movilidad_publica_santiago_spark.serving.webapp import (
    MapPointsRequest,
    QueryType,
    UserQueryRequest,
    create_app,
    dispatch,
    dispatch_map_points,
)
from data_lakehouse_movilidad_publica_santiago_spark.silver import run_silver
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (
    discover_partitions,
)

import dtpm_fixtures as fx

try:
    import fastapi  # noqa: F401

    HAS_FASTAPI = True
except ImportError:
    HAS_FASTAPI = False


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    fx.build_lake(root)
    for p in discover_partitions(root):
        run_silver(spark, p, root)
    return SilverLake(spark, root)


def test_query_request_caps():
    ok = UserQueryRequest(query_type="overview", limit=200, hour_from=0, hour_to=23)
    assert ok.limit == 200
    with pytest.raises(ValidationError):
        UserQueryRequest(query_type="overview", limit=201)
    with pytest.raises(ValidationError):
        UserQueryRequest(query_type="overview", limit=0)
    with pytest.raises(ValidationError):
        UserQueryRequest(query_type="overview", hour_from=24)
    with pytest.raises(ValidationError):
        UserQueryRequest(query_type="overview", hour_to=-1)
    with pytest.raises(ValidationError):
        UserQueryRequest(query_type="nope")


def test_map_points_request_caps():
    assert MapPointsRequest(limit=2000).limit == 2000
    with pytest.raises(ValidationError):
        MapPointsRequest(limit=2001)
    assert MapPointsRequest().limit == 400


def test_dispatch_all_query_types(lake):
    for qt in QueryType:
        resp = dispatch(lake, UserQueryRequest(query_type=qt, limit=2))
        assert resp.query_type == qt
        assert resp.row_count == len(resp.rows)
        assert resp.row_count >= 1
    over = dispatch(lake, UserQueryRequest(query_type="overview"))
    assert over.rows[0]["viajes_observados"] == 4
    top = dispatch(lake, UserQueryRequest(query_type="top_boardings", limit=2))
    assert top.row_count == 2


def test_dispatch_map_points(lake):
    out = dispatch_map_points(lake, MapPointsRequest(limit=5))
    # the fixture lake shares no stops between subidas and etapas, so
    # the inner join correctly yields zero points — the envelope
    # contract is what this endpoint test pins
    assert out["point_count"] == len(out["points"])
    for p in out["points"]:
        assert {"stop_code", "lat", "lon"} <= set(p)


@pytest.mark.skipif(HAS_FASTAPI, reason="fastapi present — gate inert")
def test_create_app_gate_without_fastapi(lake):
    with pytest.raises(ImportError, match="fastapi"):
        create_app(lake)


@pytest.mark.skipif(not HAS_FASTAPI, reason="fastapi not installed")
def test_http_roundtrip(lake):  # pragma: no cover - env-gated
    from fastapi.testclient import TestClient

    client = TestClient(create_app(lake))
    health = client.get("/api/health").json()
    assert health["status"] == "ok" and health["data_ready"]
    # /api/query honors the reference's 200-row cap (main.py:37)
    r = client.post("/api/query", json={"query_type": "overview"})
    assert r.status_code == 200 and r.json()["row_count"] == 1
    at_cap = client.post(
        "/api/query", json={"query_type": "overview", "limit": 200}
    )
    assert at_cap.status_code == 200
    bad = client.post("/api/query", json={"query_type": "overview", "limit": 999})
    assert bad.status_code == 422
    # /api/map_points honors the 2000-point cap (main.py:53)
    pts = client.post("/api/map_points", json={"limit": 2000})
    assert pts.status_code == 200
    body = pts.json()
    assert body["point_count"] == len(body["points"]) <= 2000
    too_many = client.post("/api/map_points", json={"limit": 2001})
    assert too_many.status_code == 422
