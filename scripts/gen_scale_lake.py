"""Generate a DTPM-shaped lake at configurable scale for throughput
measurement (shapes per FIXTURES.md; deterministic seed).

Quarantine parity (round 10): defects are planted at EXACTLY the
reference's published per-reason quarantine distribution
(lake/processed/_quality/**/quality.json — viajes 2025-04-21:
NEG_DISTANCE 14,854 + BAD_RANGE_N_ETAPAS 272 of 3,621,017; etapas
week: NEG_DISTANCE 100,606 + BAD_UTM_X 6,364 of 28,447,535; subidas:
0), scaled proportionally at other row counts and exact at the
reference sizes.  The two reasons per dataset are planted on disjoint
row-parity halves with an evenly-spread Bresenham selector, so the
ordered quality chain assigns each planted row its intended reason —
``expected_quarantine(dataset, n)`` returns the planted counts for a
replay to assert against the silver layer's quality.json.

Uses DuckDB to synthesize and write the pipe-CSVs fast.

    python scripts/gen_scale_lake.py --out /tmp/scale_lake \
        --viajes 1000000 --etapas 2000000 --subidas 200000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lakehouse_movilidad_publica_santiago_spark.schemas import (  # noqa: E402
    ETAPAS_RAW_COLUMNS,
    SUBIDAS_RAW_COLUMNS,
    VIAJES_RAW_COLUMNS,
)
from data_lakehouse_movilidad_publica_santiago_spark.sources.catalog import (  # noqa: E402
    write_meta,
)

N_STOPS = 12_000
N_SERVICES = 1_000
N_CARDS_DIV = 5  # cards ≈ rows / 5


def _pdir(root: Path, dataset: str, cut: str) -> Path:
    p = (
        root
        / "raw"
        / "dtpm"
        / f"dataset={dataset}"
        / "year=2025"
        / "month=04"
        / f"cut={cut}"
    )
    p.mkdir(parents=True, exist_ok=True)
    return p


# per-row deterministic pseudo-randoms from the row id
R = "(hash(i * {salt}) % {mod})"


def r(salt: int, mod: int) -> str:
    return R.format(salt=salt, mod=mod)


# The reference's published quality.json distributions (its real
# production run over the April 2025 DTPM cuts) — the parity targets.
REF_QUALITY: dict[str, dict[str, int]] = {
    "viajes": {
        "__total__": 3_621_017,
        "NEG_DISTANCE": 14_854,
        "BAD_RANGE_N_ETAPAS": 272,
    },
    "etapas": {
        "__total__": 28_447_535,
        "NEG_DISTANCE": 100_606,
        "BAD_UTM_X": 6_364,
    },
    "subidas_30m": {"__total__": 747_593},
}


def expected_quarantine(dataset: str, n: int) -> dict[str, int]:
    """Planted per-reason counts for an ``n``-row generation: exactly
    the reference's counts at the reference's row count, proportional
    (rounded) otherwise.  Zero-count reasons are dropped."""
    ref = REF_QUALITY[dataset]
    total = ref["__total__"]
    out = {
        k: (v if n == total else round(n * v / total))
        for k, v in ref.items()
        if k != "__total__"
    }
    return {k: v for k, v in out.items() if v > 0}


def _spread_mark(c: int, h: int) -> str:
    """SQL predicate over the half-row index ``j`` that marks EXACTLY
    ``c`` of ``h`` rows, evenly spread (Bresenham: the mark moves one
    step whenever floor((j+1)c/h) advances past floor(jc/h))."""
    if c <= 0:
        return "FALSE"
    if c > h:
        raise ValueError(f"cannot plant {c} defects in {h} rows")
    return f"((((i // 2) * {c}) // {h}) < ((((i // 2) + 1) * {c}) // {h}))"


def _even_mark(n: int, c: int) -> str:
    """Exactly ``c`` marks among the even rows of 0..n-1."""
    return f"((i % 2 = 0) AND {_spread_mark(c, (n + 1) // 2)})"


def _odd_mark(n: int, c: int) -> str:
    """Exactly ``c`` marks among the odd rows of 0..n-1."""
    return f"((i % 2 = 1) AND {_spread_mark(c, n // 2)})"


def gen_viajes(
    con: duckdb.DuckDBPyConnection, root: Path, n: int, cut: str = "2025-04-21"
) -> Path:
    pdir = _pdir(root, "viajes", cut)
    cards = max(n // N_CARDS_DIV, 1)
    planted = expected_quarantine("viajes", n)
    # exact per-reason planting on disjoint row-parity halves: the
    # quality chain checks BAD_RANGE_N_ETAPAS before NEG_DISTANCE, so
    # disjointness makes each planted row report its intended reason
    neg_mark = _even_mark(n, planted.get("NEG_DISTANCE", 0))
    bad_mark = _odd_mark(n, planted.get("BAD_RANGE_N_ETAPAS", 0))
    exprs: dict[str, str] = {
        "tipodia": "'0'",
        "factor_expansion": f"CAST(1.0 + {r(11, 5000)} / 1000.0 AS VARCHAR)",
        # exact count of out-of-range n_etapas → BAD_RANGE_N_ETAPAS
        "n_etapas": f"CASE WHEN {bad_mark} THEN '7' ELSE CAST(1 + {r(17, 4)} AS VARCHAR) END",
        # exact count of negative distance → NEG_DISTANCE
        "distancia_eucl": f"CASE WHEN {neg_mark} THEN '-5.0' ELSE CAST(100 + {r(23, 20000)} AS VARCHAR) END",
        "distancia_ruta": f"CAST(150 + {r(29, 30000)} AS VARCHAR)",
        "tiempo_inicio_viaje": f"strftime(TIMESTAMP '{cut} 05:00:00' + INTERVAL (({r(31, 64800)})) SECOND, '%Y-%m-%d %H:%M:%S')",
        "tiempo_fin_viaje": f"strftime(TIMESTAMP '{cut} 05:20:00' + INTERVAL (({r(31, 64800)})) SECOND, '%Y-%m-%d %H:%M:%S')",
        "periodo_inicio_viaje": f"'0' || CAST(1 + {r(37, 8)} AS VARCHAR) || ' - PERIODO'",
        "periodo_fin_viaje": f"'0' || CAST(1 + {r(41, 8)} AS VARCHAR) || ' - PERIODO'",
        "paradero_inicio_viaje": f"'S-' || CAST({r(43, N_STOPS)} AS VARCHAR)",
        "paradero_fin_viaje": f"'S-' || CAST({r(47, N_STOPS)} AS VARCHAR)",
        "comuna_inicio_viaje": f"'COMUNA' || CAST({r(53, 40)} AS VARCHAR)",
        "comuna_fin_viaje": f"'COMUNA' || CAST({r(59, 40)} AS VARCHAR)",
        "zona_inicio_viaje": f"CAST(1 + {r(61, 800)} AS VARCHAR)",
        "zona_fin_viaje": f"CAST(1 + {r(67, 800)} AS VARCHAR)",
        "id_tarjeta": (
            # ~1% cash trips (NULL card)
            f"CASE WHEN {r(71, 100)} = 0 THEN '-' ELSE 'C' || CAST({r(73, 1000000007)} % {cards} AS VARCHAR) END"
        ),
        "id_viaje": f"CAST(1 + {r(79, 12)} AS VARCHAR)",
        "contrato": f"'U' || CAST(1 + {r(83, 7)} AS VARCHAR)",
        "proposito": f"CASE {r(89, 4)} WHEN 0 THEN 'trabajo' WHEN 1 THEN 'estudio' WHEN 2 THEN 'salud' ELSE 'otro' END",
        "tviaje2": f"CAST(5 + {r(97, 90)} AS VARCHAR)",
    }
    for leg in range(1, 5):
        cond = f"(1 + {r(17, 4)}) >= {leg}"  # legs beyond n_etapas stay '-'
        exprs[f"tipo_transporte_{leg}"] = (
            f"CASE WHEN {cond} THEN CAST(1 + {r(101 + leg, 4)} AS VARCHAR) ELSE '-' END"
        )
        exprs[f"srv_{leg}"] = (
            f"CASE WHEN {cond} THEN 'T' || CAST({r(107 + leg, N_SERVICES)} AS VARCHAR) ELSE '-' END"
        )
        op_col = ["op_1era_etapa", "op_2da_etapa", "op_3era_etapa", "op_4ta_etapa"][leg - 1]
        exprs[op_col] = f"CASE WHEN {cond} THEN 'U' || CAST(1 + {r(83, 7)} AS VARCHAR) ELSE '-' END"
        exprs[f"paradero_subida_{leg}"] = (
            f"CASE WHEN {cond} THEN 'S-' || CAST({r(113 + leg, N_STOPS)} AS VARCHAR) ELSE '-' END"
        )
        exprs[f"paradero_bajada_{leg}"] = (
            f"CASE WHEN {cond} THEN 'S-' || CAST({r(127 + leg, N_STOPS)} AS VARCHAR) ELSE '-' END"
        )
        exprs[f"tiempo_subida_{leg}"] = (
            f"CASE WHEN {cond} THEN strftime(TIMESTAMP '{cut} 05:00:00' + INTERVAL (({r(31, 64800)}) + {leg} * 600) SECOND, '%Y-%m-%d %H:%M:%S') ELSE '-' END"
        )
        exprs[f"tiempo_bajada_{leg}"] = (
            f"CASE WHEN {cond} THEN strftime(TIMESTAMP '{cut} 05:05:00' + INTERVAL (({r(31, 64800)}) + {leg} * 600) SECOND, '%Y-%m-%d %H:%M:%S') ELSE '-' END"
        )
        exprs[f"zona_subida_{leg}"] = f"CASE WHEN {cond} THEN CAST(1 + {r(131 + leg, 800)} AS VARCHAR) ELSE '-' END"
        exprs[f"zona_bajada_{leg}"] = f"CASE WHEN {cond} THEN CAST(1 + {r(137 + leg, 800)} AS VARCHAR) ELSE '-' END"
        exprs[f"periodo_bajada_{leg}"] = f"CASE WHEN {cond} THEN '03 - PERIODO' ELSE '-' END"
        exprs[f"tv{leg}"] = f"CASE WHEN {cond} THEN CAST(2 + {r(139 + leg, 40)} AS VARCHAR) ELSE '-' END"
        if leg <= 3:
            exprs[f"tc{leg}"] = f"CASE WHEN {cond} THEN CAST({r(149 + leg, 10)} AS VARCHAR) ELSE '-' END"
            exprs[f"te{leg}"] = f"CASE WHEN {cond} THEN CAST({r(151 + leg, 15)} AS VARCHAR) ELSE '-' END"

    select = ", ".join(
        f"{exprs.get(c, chr(39) + '-' + chr(39))} AS \"{c if c else '_empty'}\""
        for c in VIAJES_RAW_COLUMNS
    )
    out = pdir / f"{cut}.viajes.csv"
    con.execute(
        f"COPY (SELECT {select} FROM (SELECT range AS i FROM range({n}))) "
        f"TO '{out}' (DELIMITER '|', HEADER)"
    )
    write_meta(pdir, "viajes", cut, 2025, 4, VIAJES_RAW_COLUMNS, n)
    return pdir


def gen_etapas(con: duckdb.DuckDBPyConnection, root: Path, n: int) -> Path:
    cut = "2025-04-21_2025-04-27"
    pdir = _pdir(root, "etapas", cut)
    planted = expected_quarantine("etapas", n)
    # the quality chain checks BAD_UTM_X before NEG_DISTANCE; disjoint
    # parity halves keep each planted row on its intended reason
    neg_mark = _even_mark(n, planted.get("NEG_DISTANCE", 0))
    utm_mark = _odd_mark(n, planted.get("BAD_UTM_X", 0))
    exprs = {
        "operador": f"'U' || CAST(1 + {r(7, 7)} AS VARCHAR)",
        "id_etapa": f"CAST(1 + {r(11, 500000)} AS VARCHAR)",
        "tipo_dia": f"CAST({r(13, 3)} AS VARCHAR)",
        "tipo_transporte": f"CAST(1 + {r(17, 4)} AS VARCHAR)",
        "fExpansionServicioPeriodoTS": f"CAST(1.0 + {r(19, 4000)} / 1000.0 AS VARCHAR)",
        # always a parseable boolean: the reference's published etapas
        # quality.json has NO BAD_BOOLEAN rows
        "tiene_bajada": f"CAST({r(29, 2)} AS VARCHAR)",
        "tiempo_subida": f"strftime(TIMESTAMP '{cut[:10]} 05:00:00' + INTERVAL (({r(31, 601200)})) SECOND, '%Y-%m-%d %H:%M:%S')",
        "tiempo_bajada": f"strftime(TIMESTAMP '2025-04-21 05:10:00' + INTERVAL (({r(31, 601200)})) SECOND, '%Y-%m-%d %H:%M:%S')",
        "tiempo_etapa": f"CAST(60 + {r(37, 2400)} AS VARCHAR)",
        # exact count of out-of-box UTM → BAD_UTM_X
        "x_subida": f"CASE WHEN {utm_mark} THEN '100000' ELSE CAST(260000 + {r(43, 180000)} AS VARCHAR) END",
        "y_subida": f"CAST(6210000 + {r(47, 180000)} AS VARCHAR)",
        "x_bajada": f"CAST(260000 + {r(53, 180000)} AS VARCHAR)",
        "y_bajada": f"CAST(6210000 + {r(59, 180000)} AS VARCHAR)",
        # exact count of negative distance → NEG_DISTANCE
        "dist_ruta_paraderos": f"CASE WHEN {neg_mark} THEN '-7.0' ELSE CAST(100 + {r(61, 5000)} AS VARCHAR) END",
        "dist_eucl_paraderos": f"CAST(80 + {r(67, 4000)} AS VARCHAR)",
        "servicio_subida": f"'T' || CAST({r(71, N_SERVICES)} AS VARCHAR)",
        "servicio_bajada": f"'T' || CAST({r(73, N_SERVICES)} AS VARCHAR)",
        "parada_subida": f"'S-' || CAST({r(79, N_STOPS)} AS VARCHAR)",
        "parada_bajada": f"'S-' || CAST({r(83, N_STOPS)} AS VARCHAR)",
        "comuna_subida": f"'COMUNA' || CAST({r(89, 40)} AS VARCHAR)",
        "comuna_bajada": f"'COMUNA' || CAST({r(97, 40)} AS VARCHAR)",
        "zona_subida": f"CAST(1 + {r(101, 800)} AS VARCHAR)",
        "zona_bajada": f"CAST(1 + {r(103, 800)} AS VARCHAR)",
        "tEsperaMediaIntervalo": f"CAST({r(107, 30)} / 2.0 AS VARCHAR)",
        "periodoSubida": "'05 - transicion punta manana'",
        "periodoBajada": "'05 - transicion punta manana'",
        "contrato": f"'U' || CAST(1 + {r(7, 7)} AS VARCHAR)",
    }
    select = ", ".join(
        f"{exprs.get(c, chr(39) + '-' + chr(39))} AS \"{c}\"" for c in ETAPAS_RAW_COLUMNS
    )
    out = pdir / f"{cut}.etapas.csv"
    con.execute(
        f"COPY (SELECT {select} FROM (SELECT range AS i FROM range({n}))) "
        f"TO '{out}' (DELIMITER '|', HEADER)"
    )
    write_meta(pdir, "etapas", cut, 2025, 4, ETAPAS_RAW_COLUMNS, n)
    return pdir


def gen_subidas(con: duckdb.DuckDBPyConnection, root: Path, n: int) -> Path:
    cut = "2025-04"
    pdir = _pdir(root, "subidas_30m", cut)
    exprs = {
        "Tipo_dia": f"CASE {r(7, 3)} WHEN 0 THEN 'LABORAL' WHEN 1 THEN 'SABADO' ELSE 'DOMINGO' END",
        "Modo": f"CASE {r(11, 4)} WHEN 0 THEN 'Bus' WHEN 1 THEN 'Metro' WHEN 2 THEN 'Metrotren' ELSE 'ZP' END",
        "Paradero": f"'S-' || CAST({r(13, N_STOPS)} AS VARCHAR)",
        "Comuna": f"'COMUNA' || CAST({r(17, 40)} AS VARCHAR)",
        "Media_hora": f"CAST(({r(19, 48)}) / 48.0 AS VARCHAR)",
        "Subidas_Promedio": f"CAST(({r(23, 5000)}) / 10.0 AS VARCHAR)",
    }
    select = ", ".join(f"{exprs[c]} AS \"{c}\"" for c in SUBIDAS_RAW_COLUMNS)
    out = pdir / f"{cut}.subidas_30m.csv"
    con.execute(
        f"COPY (SELECT {select} FROM (SELECT range AS i FROM range({n}))) "
        f"TO '{out}' (DELIMITER '|', HEADER)"
    )
    write_meta(pdir, "subidas_30m", cut, 2025, 4, SUBIDAS_RAW_COLUMNS, n)
    return pdir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, type=Path)
    ap.add_argument("--viajes", type=int, default=1_000_000)
    ap.add_argument("--etapas", type=int, default=2_000_000)
    ap.add_argument("--subidas", type=int, default=200_000)
    args = ap.parse_args()
    con = duckdb.connect()
    gen_viajes(con, args.out, args.viajes)
    gen_etapas(con, args.out, args.etapas)
    gen_subidas(con, args.out, args.subidas)
    print(f"lake at {args.out}: viajes={args.viajes} etapas={args.etapas} "
          f"subidas={args.subidas}")


if __name__ == "__main__":
    main()
