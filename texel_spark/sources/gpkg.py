"""GeoPackage source/sink - format parity with the reference (S1-S8).

Re-creates /root/reference/processing/gpkg/gpkg.go on Spark:

* S1 table discovery from ``gpkg_geometry_columns`` (non-spatial tables
  dropped), S3 column metadata via ``PRAGMA table_info``, S4 SRS lookup.
* S2 scan: parallel read by rowid ranges - each task opens the sqlite
  file itself (mapInPandas over a ranges table), so a 1000-executor
  cluster reads one GPKG without a driver bottleneck as long as the file
  is on a shared/posix-mounted store; geometry blobs decode to WKT in
  the same Arrow batch.
* S5/S6/S7 sink: target DDL + paged transactional insert (pagesize 1000,
  main.go:81-88) + running layer extent.  GPKG is a single sqlite file,
  i.e. inherently single-writer - identical to the reference, which also
  writes one file per zoom sequentially; the engine's scale path is the
  partitioned parquet/Iceberg sink (operators.snap_tiles), and GPKG is
  the interchange edge.
"""

from __future__ import annotations

import os
import sqlite3
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


@dataclass(frozen=True)
class GpkgTable:
    name: str
    geometry_column: str
    geometry_type: str
    srs_id: int
    columns: tuple[tuple[str, str], ...]  # (name, sqlite type)


def get_table_info(path: str) -> list[GpkgTable]:
    """S1+S3+S4: list spatial tables (gpkg.go:148-173)."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name, column_name, geometry_type_name, srs_id FROM gpkg_geometry_columns"
        ).fetchall()
        tables = []
        for tname, gcol, gtype, srs in rows:
            cols = tuple(
                (r[1], (r[2] or "").upper())
                for r in con.execute(f'PRAGMA table_info("{tname}")').fetchall()
            )
            tables.append(GpkgTable(tname, gcol, gtype, srs, cols))
        return tables
    finally:
        con.close()


def _spark_type(sqlite_type: str):
    t = sqlite_type.upper()
    if t.startswith("INT"):
        return LongType()
    if t in ("REAL", "DOUBLE", "FLOAT"):
        return DoubleType()
    if t in ("DATETIME", "TIMESTAMP"):
        return TimestampType()
    return StringType()


def read_features(spark: SparkSession, path: str, table: str, n_splits: int = 32) -> DataFrame:
    """S2 scan: rowid-range parallel read + WKB->WKT decode per batch.

    Output: attribute columns + ``geom_kind`` + ``wkt`` (the engine's
    geometry interchange), mirroring ReadFeatures' attribute/geometry
    split (gpkg.go:82-146).
    """
    info = next(t for t in get_table_info(path) if t.name == table)
    attr_cols = [(c, st) for c, st in info.columns if c != info.geometry_column]
    schema = StructType(
        [StructField(c, _spark_type(st)) for c, st in attr_cols]
        + [StructField("geom_kind", StringType()), StructField("wkt", StringType())]
    )
    con = sqlite3.connect(path)
    try:
        min_id, max_id = con.execute(f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"').fetchone()
    finally:
        con.close()
    if min_id is None:
        return spark.createDataFrame([], schema)
    step = max(1, (max_id - min_id + 1) // n_splits)
    ranges = [(lo, min(lo + step - 1, max_id)) for lo in range(min_id, max_id + 1, step)]
    ranges_df = spark.createDataFrame(ranges, "lo long, hi long").repartition(len(ranges))

    gcol = info.geometry_column
    sel_cols = ", ".join(f'"{c}"' for c, _ in attr_cols)
    attr_names = [c for c, _ in attr_cols]

    def scan(batches):
        import pandas as pd

        from ..functions.wkb import gpkg_blob_to_geometry
        from ..functions.wkt import geometry_to_wkt

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                c = sqlite3.connect(path)
                try:
                    rows = c.execute(
                        f'SELECT {sel_cols}, "{gcol}" FROM "{table}" WHERE rowid BETWEEN ? AND ?',
                        (int(lo), int(hi)),
                    ).fetchall()
                finally:
                    c.close()
                if not rows:
                    continue
                data = {name: [r[i] for r in rows] for i, name in enumerate(attr_names)}
                kinds, wkts = [], []
                for r in rows:
                    blob = r[-1]
                    if blob is None:
                        kinds.append(None)
                        wkts.append(None)
                        continue
                    kind, coords = gpkg_blob_to_geometry(bytes(blob))
                    kinds.append(kind)
                    wkts.append(geometry_to_wkt(kind, coords))
                data["geom_kind"] = kinds
                data["wkt"] = wkts
                yield pd.DataFrame(data)

    return ranges_df.mapInPandas(scan, schema=schema)


_GPKG_DDL = [
    """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""",
    """CREATE TABLE IF NOT EXISTS gpkg_contents (
        table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE,
        description TEXT DEFAULT '', last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""",
    """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""",
]


def write_features(
    df: DataFrame,
    path: str,
    table: str,
    srs_id: int = 28992,
    geometry_type: str = "MULTIPOLYGON",
    page_size: int = 1000,
) -> dict:
    """S5+S6+S7 sink: create target tables with the source schema, insert
    in page-sized transactions, fold the layer extent (gpkg.go:190-272).

    Expects a DataFrame with attribute columns + (geom_kind, wkt).
    Returns {rows, extent}.
    """
    from ..functions.wkb import geometry_to_gpkg_blob
    from ..functions.wkt import parse_wkt, polygon_bbox

    attr_fields = [f for f in df.schema.fields if f.name not in ("geom_kind", "wkt")]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")
        for ddl in _GPKG_DDL:
            con.execute(ddl)
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?, ?, 'EPSG', ?, 'undefined', NULL)",
            (f"EPSG:{srs_id}", srs_id, srs_id),
        )

        def sqlite_type(f):
            if isinstance(f.dataType, LongType):
                return "INTEGER"
            if isinstance(f.dataType, DoubleType):
                return "REAL"
            return "TEXT"

        col_ddl = ", ".join(f'"{f.name}" {sqlite_type(f)}' for f in attr_fields)
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, {col_ddl}, geom BLOB)')
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (table, geometry_type, srs_id),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, data_type, identifier, srs_id) VALUES (?, 'features', ?, ?)",
            (table, table, srs_id),
        )
        con.commit()

        names = [f.name for f in attr_fields]
        placeholders = ", ".join("?" for _ in range(len(names) + 1))
        insert_sql = f'INSERT INTO "{table}" ({", ".join(chr(34) + n + chr(34) for n in names)}, geom) VALUES ({placeholders})'

        n = 0
        ext = [None, None, None, None]
        page = []
        # toLocalIterator streams partitions to the single writer - the
        # same topology as the reference's per-zoom writer goroutine
        for row in df.toLocalIterator():
            kind, coords = parse_wkt(row["wkt"])
            blob = geometry_to_gpkg_blob(kind, coords, srs_id)
            if kind in ("polygon", "multipolygon"):
                rings = coords if kind == "polygon" else [r for p in coords for r in p]
                bb = polygon_bbox(rings)
            elif kind == "point":
                bb = (coords[0], coords[1], coords[0], coords[1])
            elif kind == "multilinestring":
                xs = [p[0] for ln in coords for p in ln]
                ys = [p[1] for ln in coords for p in ln]
                bb = (min(xs), min(ys), max(xs), max(ys))
            else:  # linestring, multipoint
                xs = [p[0] for p in coords]
                ys = [p[1] for p in coords]
                bb = (min(xs), min(ys), max(xs), max(ys))
            ext[0] = bb[0] if ext[0] is None else min(ext[0], bb[0])
            ext[1] = bb[1] if ext[1] is None else min(ext[1], bb[1])
            ext[2] = bb[2] if ext[2] is None else max(ext[2], bb[2])
            ext[3] = bb[3] if ext[3] is None else max(ext[3], bb[3])
            page.append(tuple(row[nm] for nm in names) + (blob,))
            if len(page) >= page_size:
                con.executemany(insert_sql, page)
                con.commit()  # one transaction per page (gpkg.go:205-221)
                n += len(page)
                page = []
        if page:
            con.executemany(insert_sql, page)
            con.commit()
            n += len(page)
        if ext[0] is not None:
            con.execute(
                "UPDATE gpkg_contents SET min_x=?, min_y=?, max_x=?, max_y=? WHERE table_name=?",
                (*ext, table),
            )
            con.commit()
        return {"rows": n, "extent": tuple(ext)}
    finally:
        con.close()
