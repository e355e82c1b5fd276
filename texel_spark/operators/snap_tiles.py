"""The flagship pipeline: documents -> snap -> tile keys -> partitioned sink.

Physical plan (SURVEY.md section 4) - one shuffle total:

    scan documents (parquet/Iceberg, column-pruned)          [narrow]
    -> posexplode spans, filter kind='geom'                  [narrow]
    -> snap kernel (mapInPandas, whole-batch numpy, int64)   [narrow, CPU]
    -> per-zoom covering-tile expansion + Morton tile_id     [narrow, JVM + vectorized numpy]
    -> repartition(zoom, salted tile_id)                     [THE shuffle]
    -> partitioned write + per-partition metrics/lineage     [sink]

Scale notes
-----------
* The snap kernel is strictly per-feature, so the whole stage before the
  shuffle is narrow: Spark fans it out over input splits with no data
  exchange; 1000 executors scale linearly (reference kernel is
  single-threaded per table: processing/processing.go:22-76).
* The one shuffle is keyed by (zoom, tile_id) with an explicit salt -
  dense urban tiles are Zipfian hot keys, and AQE's skew splitting
  cannot split a skewed *write* partition, salting can.
* Grid metadata (a few KB) is broadcast, never joined.
* Resume: the sink records a manifest of completed (zoom, bucket)
  pairs (bucket = feature hash, filter prunes before the tile explode);
  re-running skips them and a mid-zoom kill re-does only unfinished
  buckets, mirroring the reference's paged/transactional writes
  (processing/gpkg/gpkg.go:205-272).
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..grid.tms import TileMatrixSet, TOP_LEFT
from ..kernel.snap import SnapConfig
from ..sources.documents import geometry_spans

SNAPPED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("zoom", IntegerType()),
        StructField("geom_kind", StringType()),
        StructField("wkt", StringType()),
        StructField("minx", DoubleType()),
        StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxy", DoubleType()),
        StructField("n_polys", IntegerType()),
    ]
)


def _emit_nonpolygon(emit, doc_id, span_idx, wkt, tm_ids_):
    """Non-polygon spans pass through unchanged to every zoom
    (processing/processing.go:62-69)."""
    from ..functions.wkt import geometry_to_wkt, parse_wkt

    kind, coords = parse_wkt(wkt)
    if kind == "point":
        bbox = (coords[0], coords[1], coords[0], coords[1])
    elif kind == "multilinestring":
        xs = [p[0] for ln in coords for p in ln]
        ys = [p[1] for ln in coords for p in ln]
        bbox = (min(xs), min(ys), max(xs), max(ys))
    else:
        xs = [p[0] for p in coords]
        ys = [p[1] for p in coords]
        bbox = (min(xs), min(ys), max(xs), max(ys))
    w = geometry_to_wkt(kind, coords)
    for zoom in tm_ids_:
        emit(doc_id, span_idx, zoom, kind, w, bbox, 0)


def _legacy_batch(pdf, tms_, tm_ids_, cfg, emit):
    """Scalar-codec fallback for batches the array codec can't parse
    (3D/odd WKT); same per-row flow the r2 operator used."""
    from ..functions.wkt import multipolygon_to_wkt, parse_wkt, polygon_bbox, polygon_to_wkt
    from ..kernel.snap_batch import snap_polygons_batch

    parsed = []
    members: list = []
    member_row: list[int] = []
    for row_i, wkt in enumerate(pdf["wkt"]):
        kind, coords = parse_wkt(wkt)
        parsed.append((kind, coords))
        if kind == "polygon":
            members.append(coords)
            member_row.append(row_i)
        elif kind == "multipolygon":
            members.extend(coords)
            member_row.extend([row_i] * len(coords))
    snapped = snap_polygons_batch(members, tms_, tm_ids_, cfg) if members else []
    regrouped: dict[int, dict[int, list]] = {}
    for res, row_i in zip(snapped, member_row):
        rg = regrouped.setdefault(row_i, {})
        for zoom, polys in res.items():
            rg.setdefault(zoom, []).extend(polys)
    for row_i, (doc_id, span_idx) in enumerate(zip(pdf["doc_id"], pdf["span_idx"])):
        kind, _ = parsed[row_i]
        if kind in ("polygon", "multipolygon"):
            src_multi = kind == "multipolygon"
            for zoom, polys in regrouped.get(row_i, {}).items():
                if not polys:
                    continue
                multi = src_multi or len(polys) > 1
                w = multipolygon_to_wkt(polys) if multi else polygon_to_wkt(polys[0])
                bbox = polygon_bbox([r for p in polys for r in p])
                emit(doc_id, int(span_idx), zoom, "multipolygon" if multi else "polygon", w, bbox, len(polys))
        else:
            _emit_nonpolygon(emit, doc_id, int(span_idx), pdf["wkt"].iloc[row_i], tm_ids_)


def _process_batch(pdf, tms_, tm_ids_, cfg):
    """One Arrow batch through the snap stage: batch WKT parse ->
    flat-array snap kernel -> vectorized assembly -> digit-exact batch
    WKT emit.  Per-row Python only touches the rare scalar-path rows
    (multipolygon merges, self-tangent rings, odd WKT kinds)."""
    import numpy as np
    import pandas as pd

    from ..functions import wkt_batch as wb
    from ..functions.wkt import multipolygon_to_wkt, polygon_bbox, polygon_to_wkt
    from ..kernel.snap_batch import _ring_floats, snap_flat_batch

    names = SNAPPED_SCHEMA.fieldNames()
    out = {name: [] for name in names}

    def emit(doc_id, span_idx, zoom, kind, wkt, bbox, n_polys):
        out["doc_id"].append(doc_id)
        out["span_idx"].append(span_idx)
        out["zoom"].append(zoom)
        out["geom_kind"].append(kind)
        out["wkt"].append(wkt)
        out["minx"].append(bbox[0])
        out["miny"].append(bbox[1])
        out["maxx"].append(bbox[2])
        out["maxy"].append(bbox[3])
        out["n_polys"].append(n_polys)

    texts = pdf["wkt"].tolist()
    # per-row resilience (ADVICE r3): odd rows (3D/EMPTY WKT) route
    # through the scalar codec INDIVIDUALLY, so the emitted wkt text of
    # every clean row stays the digit-exact batch formatter no matter
    # what else shares the Arrow batch
    parsed, fb_rows = wb.parse_polygons_batch_resilient(texts)
    if fb_rows:
        _legacy_batch(pdf.iloc[fb_rows].reset_index(drop=True), tms_, tm_ids_, cfg, emit)

    doc_ids = pdf["doc_id"].tolist()
    span_idxs = pdf["span_idx"].tolist()
    n_members = parsed.member_fastrow.size
    n_fast_rows = parsed.rows.size
    row_members = np.searchsorted(parsed.member_fastrow, np.arange(n_fast_rows + 1))
    # members of multi-member rows must come back as dicts (merge step)
    multi_member_row = (row_members[1:] - row_members[:-1]) > 1
    need_dicts = multi_member_row[parsed.member_fastrow] if n_members else None
    results, store, columnar = snap_flat_batch(
        parsed.xy, parsed.ring_member, parsed.ring_start, parsed.ring_len,
        n_members, tms_, tm_ids_, cfg, need_dicts=need_dicts, collect_columnar=True,
    )

    # fast-emit accumulators (vectorized WKT + bbox at the end)
    f_out_idx: list = []  # output row (in the `out` lists) to patch
    f_is_multi: list = []
    f_poly_bounds: list = [0]
    f_ring_bounds: list = [0]
    f_ra: list = []
    f_rb: list = []
    f_rrev: list = []

    for fr in range(n_fast_rows):
        m0, m1 = int(row_members[fr]), int(row_members[fr + 1])
        if m1 - m0 == 1 and results[m0] is None:
            continue  # columnar lane (emitted in bulk below)
        row_i = int(parsed.rows[fr])
        doc_id = doc_ids[row_i]
        span_idx = int(span_idxs[row_i])
        src_multi = bool(parsed.is_multi[fr])
        rg: dict[int, list] = {}
        for m in range(m0, m1):
            for zoom, polys in results[m].items():
                rg.setdefault(zoom, []).extend(polys)
        for zoom, polys in rg.items():
            if not polys:
                continue
            multi = src_multi or len(polys) > 1
            kind = "multipolygon" if multi else "polygon"
            if all(isinstance(r, tuple) for p in polys for r in p):
                f_out_idx.append(len(out["wkt"]))
                f_is_multi.append(multi)
                f_poly_bounds.append(f_poly_bounds[-1] + len(polys))
                for p in polys:
                    f_ring_bounds.append(f_ring_bounds[-1] + len(p))
                    for a, b, rev in p:
                        f_ra.append(a)
                        f_rb.append(b)
                        f_rrev.append(rev)
                emit(doc_id, span_idx, zoom, kind, None, (0.0, 0.0, 0.0, 0.0), len(polys))
            else:
                mat = [
                    [
                        _ring_floats(store.fx, store.fy, r[0], r[1], r[2])
                        if isinstance(r, tuple)
                        else r
                        for r in p
                    ]
                    for p in polys
                ]
                w = multipolygon_to_wkt(mat) if multi else polygon_to_wkt(mat[0])
                bbox = polygon_bbox([r for p in mat for r in p])
                emit(doc_id, span_idx, zoom, kind, w, bbox, len(polys))

    for row_i in parsed.other_rows:
        _emit_nonpolygon(emit, doc_ids[row_i], int(span_idxs[row_i]), texts[row_i], tm_ids_)

    # -- bulk lane: columnar members (one poly, one fast ring, per level) ----
    n_loop = len(out["wkt"])
    n_loop_geo = len(f_is_multi)
    c_doc = []
    c_span = []
    c_zoom = []
    c_multi = []
    c_ra = []
    c_rb = []
    c_rrev = []
    if columnar:
        doc_np = np.asarray(doc_ids, dtype=object)
        span_np = np.asarray(span_idxs, dtype=np.int64)
        for tm in sorted(columnar):
            mem, a, b, rev = columnar[tm]
            frows = parsed.member_fastrow[mem]
            orig = parsed.rows[frows]
            c_doc.append(doc_np[orig])
            c_span.append(span_np[orig])
            c_zoom.append(np.full(mem.size, tm, dtype=np.int64))
            c_multi.append(parsed.is_multi[frows])
            c_ra.append(a)
            c_rb.append(b)
            c_rrev.append(rev)
    n_col = sum(arr.size for arr in c_zoom) if c_zoom else 0

    # -- one vectorized WKT + bbox pass over BOTH fast lanes -----------------
    if n_loop_geo or n_col:
        is_multi = np.concatenate(
            [np.asarray(f_is_multi, dtype=bool)] + c_multi
            if c_multi
            else [np.asarray(f_is_multi, dtype=bool)]
        )
        n_geo = is_multi.size
        poly_bounds = np.empty(n_geo + 1, dtype=np.int64)
        poly_bounds[: n_loop_geo + 1] = f_poly_bounds
        ring_bounds_l = np.asarray(f_ring_bounds, dtype=np.int64)
        # columnar geoms are 1 poly / 1 ring each
        if n_col:
            poly_bounds[n_loop_geo + 1 :] = f_poly_bounds[-1] + np.arange(1, n_col + 1)
        n_polys_total = int(poly_bounds[-1])
        ring_bounds = np.empty(n_polys_total + 1, dtype=np.int64)
        ring_bounds[: ring_bounds_l.size] = ring_bounds_l
        if n_col:
            ring_bounds[ring_bounds_l.size :] = ring_bounds_l[-1] + np.arange(1, n_col + 1)
        ra = np.concatenate([np.asarray(f_ra, dtype=np.int64)] + c_ra) if c_ra else np.asarray(f_ra, dtype=np.int64)
        rb = np.concatenate([np.asarray(f_rb, dtype=np.int64)] + c_rb) if c_rb else np.asarray(f_rb, dtype=np.int64)
        rrev = np.concatenate([np.asarray(f_rrev, dtype=bool)] + c_rrev) if c_rrev else np.asarray(f_rrev, dtype=bool)
        lens = rb - ra
        pt_bounds = wb._exclusive_cumsum(lens)
        total = int(pt_bounds[-1])
        rep = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        p = np.arange(total, dtype=np.int64) - pt_bounds[:-1][rep]
        src = np.where(rrev[rep], rb[rep] - 1 - p, ra[rep] + p)
        px = store.kx[src]
        py = store.ky[src]
        texts_fast = wb.format_polygon_wkts(
            is_multi, poly_bounds, ring_bounds, pt_bounds, lens >= 2, px, py
        )
        # bbox per geometry: its points are one contiguous gathered span
        geom_pt_start = pt_bounds[ring_bounds[poly_bounds[:-1]]]
        fminx = np.minimum.reduceat(px, geom_pt_start) / 1e10
        fminy = np.minimum.reduceat(py, geom_pt_start) / 1e10
        fmaxx = np.maximum.reduceat(px, geom_pt_start) / 1e10
        fmaxy = np.maximum.reduceat(py, geom_pt_start) / 1e10
        for k, oi in enumerate(f_out_idx):
            out["wkt"][oi] = texts_fast[k]
            out["minx"][oi] = float(fminx[k])
            out["miny"][oi] = float(fminy[k])
            out["maxx"][oi] = float(fmaxx[k])
            out["maxy"][oi] = float(fmaxy[k])

    # -- final columns: loop lists + columnar arrays -------------------------
    cols = {}
    if n_col:
        cols["doc_id"] = np.concatenate([np.asarray(out["doc_id"], dtype=object)] + c_doc)
        cols["span_idx"] = np.concatenate([np.asarray(out["span_idx"], dtype=np.int64)] + c_span).astype(np.int32)
        cols["zoom"] = np.concatenate([np.asarray(out["zoom"], dtype=np.int64)] + c_zoom).astype(np.int32)
        kind_col = np.where(np.concatenate(c_multi), "multipolygon", "polygon").astype(object)
        cols["geom_kind"] = np.concatenate([np.asarray(out["geom_kind"], dtype=object), kind_col])
        cols["wkt"] = np.concatenate(
            [np.asarray(out["wkt"], dtype=object), np.asarray(texts_fast[n_loop_geo:], dtype=object)]
        )
        cols["minx"] = np.concatenate([np.asarray(out["minx"], dtype=np.float64), fminx[n_loop_geo:]])
        cols["miny"] = np.concatenate([np.asarray(out["miny"], dtype=np.float64), fminy[n_loop_geo:]])
        cols["maxx"] = np.concatenate([np.asarray(out["maxx"], dtype=np.float64), fmaxx[n_loop_geo:]])
        cols["maxy"] = np.concatenate([np.asarray(out["maxy"], dtype=np.float64), fmaxy[n_loop_geo:]])
        cols["n_polys"] = np.concatenate(
            [np.asarray(out["n_polys"], dtype=np.int64), np.ones(n_col, dtype=np.int64)]
        ).astype(np.int32)
    else:
        cols = out
    return pd.DataFrame(cols)


def snap_documents(
    docs: DataFrame,
    tms: TileMatrixSet,
    tm_ids: list[int],
    config: SnapConfig | None = None,
) -> DataFrame:
    """Geometry spans -> snapped geometries, one row per (feature, zoom).

    Non-polygon geometries pass through unchanged to every zoom and
    multipolygons are split/snapped/regrouped, exactly like the
    reference's type dispatch (processing/processing.go:22-76).

    Hot path is array programs end-to-end: batch WKT parse
    (functions/wkt_batch.py) -> flat-array snap kernel + vectorized
    assembly (kernel/snap_batch.py) -> digit-exact batch WKT emit; the
    dominant single-polygon shape flows through a fully columnar lane
    with zero per-row Python.
    """
    spark = docs.sparkSession
    config = config or SnapConfig(keep_points_and_lines=False, ignore_outside_grid=True)
    bc = spark.sparkContext.broadcast((tms, tuple(tm_ids), config))

    def kernel(batches):
        tms_, tm_ids_, cfg = bc.value
        tm_ids_ = list(tm_ids_)
        for pdf in batches:
            yield _process_batch(pdf, tms_, tm_ids_, cfg)

    return docs.mapInPandas(kernel, schema=SNAPPED_SCHEMA)


def zoom_params_df(spark: SparkSession, tms: TileMatrixSet, tm_ids: list[int]) -> DataFrame:
    """Tiny per-zoom grid constants table, always broadcast."""
    rows = []
    for z in tm_ids:
        tm = tms.tile_matrices[z]
        ox, oy = tms.to_xy_point(tm.point_of_origin)
        rows.append(
            (
                z,
                float(ox),
                float(oy),
                float(tm.tile_width) * tm.cell_size,
                float(tm.tile_height) * tm.cell_size,
                tm.matrix_width,
                tm.matrix_height,
                tm.corner_of_origin == TOP_LEFT,
            )
        )
    return spark.createDataFrame(
        rows, "zoom int, ox double, oy double, tsx double, tsy double, mw int, mh int, top_left boolean"
    )


def morton_udf():
    """Vectorized Morton interleave (numpy bit ops, no per-row Python)."""
    from ..functions.udfs import morton_z

    return morton_z


def morton_z_expr(tx, ty):
    """Morton interleave as pure JVM column expressions (whole-stage
    codegen; no Python worker in the loop).

    Same bit-spread as morton.to_z (morton/morton.go:22-48) - adding a
    Python stage just for bit twiddling would chain a second Python
    runner per task slot and oversubscribe the host (observed 2x
    slowdown at local[32]); Catalyst does this for free.
    """
    steps = (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    )

    def spread(col):
        x = col.cast("long")
        for shift, mask in steps:
            x = F.shiftleft(x, shift).bitwiseOR(x).bitwiseAND(F.lit(mask))
        return x

    return spread(tx).bitwiseOR(F.shiftleft(spread(ty), 1))


def assign_tiles(snapped: DataFrame, tms: TileMatrixSet, tm_ids: list[int]) -> DataFrame:
    """One output row per (feature, zoom, covering tile).

    Pure column math (tms20.FromNative semantics, tms20.go:664-712) over
    the snapped bbox, broadcast-joined with the per-zoom constants; tile
    range explode is bounded by each geometry's footprint.
    """
    spark = snapped.sparkSession
    params = F.broadcast(zoom_params_df(spark, tms, tm_ids))
    df = snapped.join(params, "zoom")

    tx0 = F.greatest(F.lit(0), F.floor((F.col("minx") - F.col("ox")) / F.col("tsx")).cast("int"))
    tx1 = F.least(F.col("mw") - 1, F.floor((F.col("maxx") - F.col("ox")) / F.col("tsx")).cast("int"))
    ty_top = F.when(F.col("top_left"), (F.col("oy") - F.col("maxy")) / F.col("tsy")).otherwise(
        (F.col("miny") - F.col("oy")) / F.col("tsy")
    )
    ty_bot = F.when(F.col("top_left"), (F.col("oy") - F.col("miny")) / F.col("tsy")).otherwise(
        (F.col("maxy") - F.col("oy")) / F.col("tsy")
    )
    ty0 = F.greatest(F.lit(0), F.floor(ty_top).cast("int"))
    ty1 = F.least(F.col("mh") - 1, F.floor(ty_bot).cast("int"))

    # geometry payload is NOT carried through the tile fan-out: a feature
    # can cover hundreds of deep-zoom tiles, and duplicating the geometry
    # per covering tile multiplies the byte volume by that factor.  The
    # tile index stays narrow (ids only); geometry lives once per
    # (feature, zoom) in snapped_geometries() and joins back on demand.
    df = (
        df.select("doc_id", "span_idx", "zoom", "geom_kind", "n_polys", tx0.alias("tx0"), tx1.alias("tx1"), ty0.alias("ty0"), ty1.alias("ty1"))
        .withColumn("tx", F.explode(F.sequence("tx0", "tx1")))
        .withColumn("ty", F.explode(F.sequence("ty0", "ty1")))
        .withColumn("tile_id", morton_z_expr(F.col("tx"), F.col("ty")))
    )
    return df.select(
        "doc_id", "span_idx", "zoom", "tx", "ty", "tile_id", "geom_kind", "n_polys"
    )


def snapped_geometries(snapped: DataFrame) -> DataFrame:
    """The geometry side of the normalized output: one row per
    (feature, zoom) with the snapped WKT."""
    return snapped.select("doc_id", "span_idx", "zoom", "geom_kind", "wkt", "n_polys")


def _load_manifest(path: str) -> dict:
    """Manifest schema: {"zooms": {"<z>": {"buckets": [ints], "geoms": bool}},
    "completed_zooms": [...] (derived, kept for compat)}.  Legacy
    manifests (completed_zooms only) upgrade to fully-complete entries."""
    if not os.path.exists(path):
        return {"zooms": {}}
    with open(path) as f:
        m = json.load(f)
    if "zooms" not in m:
        m["zooms"] = {
            str(z): {"buckets": None, "geoms": True} for z in m.get("completed_zooms", [])
        }
    return m


def _save_manifest(path: str, manifest: dict, tile_buckets: int) -> None:
    """Atomic write (tmp + rename): a kill mid-update never corrupts the
    on-disk source of truth (reference analog: paged transactional
    writes, processing/gpkg/gpkg.go:205-272)."""
    done = [
        int(z)
        for z, st in manifest["zooms"].items()
        if st.get("geoms")
        and (st.get("buckets") is None or len(st["buckets"]) >= tile_buckets)
    ]
    manifest["completed_zooms"] = sorted(done)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, path)


def run_pipeline(
    docs: DataFrame,
    tms: TileMatrixSet,
    tm_ids: list[int],
    output_dir: str,
    config: SnapConfig | None = None,
    salt_buckets: int = 8,
    resume: bool = True,
    tile_buckets: int = 8,
    _after_bucket_hook=None,
) -> dict:
    """End-to-end job with salted shuffle, metrics and a resumable
    per-(zoom, bucket) manifest.

    Each zoom's tile index is written as ``tile_buckets`` independent
    jobs (bucket = feature hash, so the bucket filter prunes BEFORE the
    tile explode); the manifest is updated atomically after every bucket,
    so a mid-zoom kill re-does only the unfinished buckets - completed
    buckets' files are never touched again (VERDICT r2 item 3; reference
    analog: paged transactional writes, processing/gpkg/gpkg.go:205-272).
    If an Iceberg jar ever lands, each bucket job becomes REPLACE
    PARTITIONS with the same manifest layout.

    Returns the run summary (also persisted to <output_dir>/manifest.json).
    """
    spark = docs.sparkSession
    os.makedirs(output_dir, exist_ok=True)
    manifest_path = os.path.join(output_dir, "manifest.json")
    manifest = _load_manifest(manifest_path) if resume else {"zooms": {}}

    def zoom_state(z: int) -> dict:
        st = manifest["zooms"].setdefault(str(z), {"buckets": [], "geoms": False})
        if st.get("buckets") is None:  # legacy fully-complete zoom
            st["buckets"] = list(range(tile_buckets))
        return st

    todo = [
        z
        for z in tm_ids
        if not (
            str(z) in manifest["zooms"]
            and zoom_state(z)["geoms"]
            and len(zoom_state(z)["buckets"]) >= tile_buckets
        )
    ]
    if not todo:
        return {"completed_zooms": sorted(int(z) for z in manifest["zooms"]), "metrics": {}}

    # persisted so the CPU-heavy kernel runs once for every bucket job
    snapped = (
        snap_documents(geometry_spans(docs), tms, todo, config)
        .withColumn("bucket", F.pmod(F.xxhash64("doc_id", "span_idx"), F.lit(tile_buckets)))
        .persist()
    )

    for z in todo:
        st = zoom_state(z)
        for b in range(tile_buckets):
            if b in st["buckets"]:
                continue
            # bucket filter applies BEFORE the tile explode (narrow), so
            # finer resume granularity costs no duplicated fan-out work
            part = assign_tiles(
                snapped.where((F.col("zoom") == z) & (F.col("bucket") == b)).drop("bucket"),
                tms,
                [z],
            )
            salted = part.withColumn(
                "salt", F.pmod(F.xxhash64("doc_id", "span_idx"), F.lit(salt_buckets))
            )
            (
                salted.repartition(F.col("tile_id"), F.col("salt"))
                .drop("salt", "zoom")
                .write.mode("overwrite")
                .parquet(os.path.join(output_dir, "tiles", f"zoom={z}", f"bucket={b}"))
            )
            st["buckets"] = sorted(set(st["buckets"]) | {b})
            _save_manifest(manifest_path, manifest, tile_buckets)
            if _after_bucket_hook is not None:
                _after_bucket_hook(z, b)
        if not st["geoms"]:
            (
                snapped_geometries(snapped.where(F.col("zoom") == z).drop("bucket"))
                .drop("zoom")
                .write.mode("overwrite")
                .parquet(os.path.join(output_dir, "geoms", f"zoom={z}"))
            )
            st["geoms"] = True
            _save_manifest(manifest_path, manifest, tile_buckets)

    snapped.unpersist()
    out = spark.read.parquet(os.path.join(output_dir, "tiles"))
    # per-partition lineage + row-count metrics (north rule): replaces the
    # reference's log counters (processing.go:23,70-75) and running extent
    # (gpkg.go:254-270)
    metrics = (
        out.groupBy("zoom", "tile_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("tx").alias("min_tx"),
            F.max("tx").alias("max_tx"),
            F.min("ty").alias("min_ty"),
            F.max("ty").alias("max_ty"),
        )
        .withColumn("run_ts", F.lit(int(time.time())))
    )
    metrics.write.mode("overwrite").parquet(os.path.join(output_dir, "metrics"))

    per_zoom = {int(r["zoom"]): int(r["n"]) for r in out.groupBy("zoom").agg(F.count("*").alias("n")).collect()}
    summary = {
        "completed_zooms": sorted(int(z) for z in manifest["zooms"]),
        "metrics": {"rows_per_zoom": per_zoom},
    }
    manifest["metrics"] = summary["metrics"]
    _save_manifest(manifest_path, manifest, tile_buckets)
    return summary


def snap_pipeline_df(
    docs: DataFrame, tms: TileMatrixSet, tm_ids: list[int], config: SnapConfig | None = None
) -> DataFrame:
    """The pipeline as a pure DataFrame (no sink) for entry()/bench."""
    return assign_tiles(snap_documents(geometry_spans(docs), tms, tm_ids, config), tms, tm_ids)


# -- DuckDB oracle for the JVM fan-out half (VERDICT r2 item 7) ----------

# Per-process scratch path (VERDICT r3 item 3): a fixed global path lets
# two concurrent sessions clobber each other's oracle bboxes.  The path
# is pinned once at import so queries() and oracle_sql() - which the
# driver invokes in the same process - always agree on it, regardless of
# call order, while separate processes never share a file.  Cleaned up
# at interpreter exit.
#
# Cross-process harnesses (ADVICE r4): a harness that runs queries() and
# evaluates oracle_sql() in DIFFERENT processes must export
# TEXEL_SPARK_ORACLE_SCRATCH=<same dir> to both - the env var overrides
# the per-process path, and a caller-provided dir is the caller's to
# clean up (no atexit registration).
BBOX_ORACLE_DIR = os.environ.get("TEXEL_SPARK_ORACLE_SCRATCH") or (
    f"/tmp/texel_spark_oracle_bbox_{os.getpid()}_{uuid.uuid4().hex[:8]}"
)


def _cleanup_bbox_oracle_dir() -> None:
    shutil.rmtree(BBOX_ORACLE_DIR, ignore_errors=True)


if "TEXEL_SPARK_ORACLE_SCRATCH" not in os.environ:
    atexit.register(_cleanup_bbox_oracle_dir)


def snap_tile_fanout_df(
    docs: DataFrame,
    tms: TileMatrixSet,
    tm_ids: list[int],
    config: SnapConfig | None = None,
    tag: str = "rd",
) -> DataFrame:
    """The tile-assignment half of the pipeline, restructured so a DuckDB
    oracle can verify it hash-exactly: the kernel's snapped bboxes (the
    deterministic, golden-pinned half) are materialized to parquet, and
    the returned DataFrame re-reads that parquet and runs the pure-JVM
    fan-out (zoom-params join, floor/clamp, covering-tile explode,
    Morton).  tile_fanout_oracle_sql() performs the identical math in
    SQL over the same file, so CORRECTNESS gains a rows+schema+hash
    check on everything downstream of the kernel.

    The write is EAGER (inside this call) so the oracle - which the
    driver runs after invoking the queries() callable - always reads the
    bboxes of this run, never a stale file.  ``tag`` names a per-grid
    subdirectory so several fanout queries (RD / WebMercator / NZTM, one
    oracle each) never clobber each other's bboxes within a run.
    """
    spark = docs.sparkSession
    scratch = os.path.join(BBOX_ORACLE_DIR, tag)
    snapped = snap_documents(geometry_spans(docs), tms, tm_ids, config)
    (
        snapped.select("doc_id", "span_idx", "zoom", "minx", "miny", "maxx", "maxy")
        .write.mode("overwrite")
        .parquet(scratch)
    )
    bbox = spark.read.parquet(scratch).withColumn("geom_kind", F.lit("g")).withColumn("n_polys", F.lit(1))
    return assign_tiles(bbox, tms, tm_ids).select("doc_id", "span_idx", "zoom", "tx", "ty", "tile_id")


def _spread_sql(col: str) -> str:
    """Morton bit-spread as DuckDB SQL, same shift/mask ladder as
    morton_z_expr (morton/morton.go:22-48)."""
    expr = f"CAST({col} AS BIGINT)"
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        expr = f"((({expr}) | (({expr}) << {shift})) & {mask})"
    return expr


def tile_fanout_oracle_sql(tms: TileMatrixSet, tm_ids: list[int], tag: str = "rd") -> str:
    """DuckDB twin of snap_tile_fanout_df's JVM half: identical grid
    constants (embedded as full-precision literals), identical
    floor/clamp/explode/Morton math, over the same bbox parquet
    (``tag`` = the per-grid scratch subdirectory the fanout wrote)."""
    vals = []
    for z in tm_ids:
        tm = tms.tile_matrices[z]
        ox, oy = tms.to_xy_point(tm.point_of_origin)
        tsx = float(tm.tile_width) * tm.cell_size
        tsy = float(tm.tile_height) * tm.cell_size
        top = tm.corner_of_origin == TOP_LEFT
        vals.append(
            f"({z}, {float(ox)!r}, {float(oy)!r}, {tsx!r}, {tsy!r}, "
            f"{tm.matrix_width}, {tm.matrix_height}, {'TRUE' if top else 'FALSE'})"
        )
    z = f"({_spread_sql('tx')}) | (({_spread_sql('ty')}) << 1)"
    return f"""
WITH params(zoom, ox, oy, tsx, tsy, mw, mh, top_left) AS (VALUES {", ".join(vals)}),
b AS (SELECT * FROM read_parquet('{os.path.join(BBOX_ORACLE_DIR, tag)}/*.parquet')),
j AS (SELECT b.doc_id, b.span_idx, b.zoom, b.minx, b.miny, b.maxx, b.maxy,
             p.ox, p.oy, p.tsx, p.tsy, p.mw, p.mh, p.top_left
      FROM b JOIN params p ON b.zoom = p.zoom),
r AS (SELECT doc_id, span_idx, zoom,
             GREATEST(0, CAST(FLOOR((minx - ox) / tsx) AS INT)) AS tx0,
             LEAST(mw - 1, CAST(FLOOR((maxx - ox) / tsx) AS INT)) AS tx1,
             GREATEST(0, CAST(FLOOR(CASE WHEN top_left THEN (oy - maxy) / tsy ELSE (miny - oy) / tsy END) AS INT)) AS ty0,
             LEAST(mh - 1, CAST(FLOOR(CASE WHEN top_left THEN (oy - miny) / tsy ELSE (maxy - oy) / tsy END) AS INT)) AS ty1
      FROM j),
ex AS (SELECT doc_id, span_idx, zoom, ty0, ty1,
              CAST(UNNEST(generate_series(tx0, tx1)) AS INT) AS tx
       FROM r),
e AS (SELECT doc_id, span_idx, zoom, tx,
             CAST(UNNEST(generate_series(ty0, ty1)) AS INT) AS ty
      FROM ex)
SELECT doc_id, span_idx, zoom, tx, ty, {z} AS tile_id FROM e
"""
