"""Generate a DTPM-shaped lake at configurable scale for throughput
measurement (shapes per FIXTURES.md; deterministic seed; ~0.4%
quarantine rate mirroring production quality.json).

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


def gen_viajes(
    con: duckdb.DuckDBPyConnection, root: Path, n: int, cut: str = "2025-04-21"
) -> Path:
    pdir = _pdir(root, "viajes", cut)
    cards = max(n // N_CARDS_DIV, 1)
    exprs: dict[str, str] = {
        "tipodia": "'0'",
        "factor_expansion": f"CAST(1.0 + {r(11, 5000)} / 1000.0 AS VARCHAR)",
        # ~0.2% out-of-range n_etapas → BAD_RANGE_N_ETAPAS
        "n_etapas": f"CASE WHEN {r(13, 1000)} = 0 THEN '7' ELSE CAST(1 + {r(17, 4)} AS VARCHAR) END",
        # ~0.2% negative distance → NEG_DISTANCE
        "distancia_eucl": f"CASE WHEN {r(19, 500)} = 1 THEN '-5.0' ELSE CAST(100 + {r(23, 20000)} AS VARCHAR) END",
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
    exprs = {
        "operador": f"'U' || CAST(1 + {r(7, 7)} AS VARCHAR)",
        "id_etapa": f"CAST(1 + {r(11, 500000)} AS VARCHAR)",
        "tipo_dia": f"CAST({r(13, 3)} AS VARCHAR)",
        "tipo_transporte": f"CAST(1 + {r(17, 4)} AS VARCHAR)",
        "fExpansionServicioPeriodoTS": f"CAST(1.0 + {r(19, 4000)} / 1000.0 AS VARCHAR)",
        # ~0.1% bad boolean
        "tiene_bajada": f"CASE WHEN {r(23, 1000)} = 2 THEN '9' ELSE CAST({r(29, 2)} AS VARCHAR) END",
        "tiempo_subida": f"strftime(TIMESTAMP '{cut[:10]} 05:00:00' + INTERVAL (({r(31, 601200)})) SECOND, '%Y-%m-%d %H:%M:%S')",
        "tiempo_bajada": f"strftime(TIMESTAMP '2025-04-21 05:10:00' + INTERVAL (({r(31, 601200)})) SECOND, '%Y-%m-%d %H:%M:%S')",
        "tiempo_etapa": f"CAST(60 + {r(37, 2400)} AS VARCHAR)",
        # ~0.2% out-of-box UTM
        "x_subida": f"CASE WHEN {r(41, 500)} = 3 THEN '100000' ELSE CAST(260000 + {r(43, 180000)} AS VARCHAR) END",
        "y_subida": f"CAST(6210000 + {r(47, 180000)} AS VARCHAR)",
        "x_bajada": f"CAST(260000 + {r(53, 180000)} AS VARCHAR)",
        "y_bajada": f"CAST(6210000 + {r(59, 180000)} AS VARCHAR)",
        "dist_ruta_paraderos": f"CAST(100 + {r(61, 5000)} AS VARCHAR)",
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
