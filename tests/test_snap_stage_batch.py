"""The rewritten array-codec snap stage vs the r2 per-row flow.

The legacy flow (scalar WKT codec around the batch kernel, kept as
_legacy_batch for odd-WKT fallback) is the oracle: it is itself pinned to
the scalar kernel and the reference goldens.  Rows must agree exactly -
coordinates bit-for-bit after parse-back, bboxes and counts equal - on
the synthetic document distribution plus adversarial geometry rows.
"""

import pandas as pd
import pytest

pyspark = pytest.importorskip("pyspark")

from texel_spark.functions.wkt import parse_wkt
from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.snap import SnapConfig


@pytest.fixture(scope="module")
def spark():
    from texel_spark.session import get_spark

    return get_spark(app_name="texel-snapstage-tests", master="local[4]", shuffle_partitions=4)


def _canon_rows(rows):
    out = []
    for r in rows:
        kind, coords = parse_wkt(r["wkt"])
        out.append(
            (
                r["doc_id"],
                r["span_idx"],
                r["zoom"],
                r["geom_kind"],
                kind,
                repr(coords),
                r["minx"],
                r["miny"],
                r["maxx"],
                r["maxy"],
                r["n_polys"],
            )
        )
    return sorted(out)


def _legacy_rows(pdf, tms, tm_ids, cfg):
    from texel_spark.operators.snap_tiles import SNAPPED_SCHEMA, _legacy_batch

    out = {name: [] for name in SNAPPED_SCHEMA.fieldNames()}

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

    _legacy_batch(pdf, tms, tm_ids, cfg, emit)
    return _canon_rows(pd.DataFrame(out).to_dict("records"))


def _new_rows(spark, pdf, tms, tm_ids, cfg):
    from texel_spark.operators.snap_tiles import snap_documents

    df = spark.createDataFrame(pdf)
    return _canon_rows([r.asDict() for r in snap_documents(df, tms, tm_ids, cfg).collect()])


def _spans_pdf(n_docs):
    from texel_spark.sources.documents import build_document

    rows = {"doc_id": [], "span_idx": [], "wkt": []}
    for i in range(n_docs):
        doc_id, spans = build_document(i)
        for kind, text, media_ref, offset in spans:
            if kind == "geom":
                rows["doc_id"].append(doc_id)
                rows["span_idx"].append(offset)
                rows["wkt"].append(text)
    return pd.DataFrame(rows)


def test_stage_matches_legacy_on_synthetic_distribution(spark):
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [5, 9, 12]
    cfg = SnapConfig(ignore_outside_grid=True)
    pdf = _spans_pdf(400)
    assert len(pdf) > 200
    want = _legacy_rows(pdf, tms, tm_ids, cfg)
    got = _new_rows(spark, pdf, tms, tm_ids, cfg)
    assert got == want


def test_stage_matches_legacy_on_adversarial_rows(spark):
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [5, 9, 12]
    cfg = SnapConfig(ignore_outside_grid=True)
    g = "POLYGON ((117220.282 440135.898, 117210.713 440135.101, 117211.129 440130.102, 117222.198 440131.000, 117221.990 440133.510, 117220.500 440133.380))"
    rows = [
        ("d-multi", 0, "MULTIPOLYGON (((155000 463000, 156000 463000, 156000 464000, 155000 464000)), "
                       "((200000 500000, 201000 500000, 201000 501000), (200200 500200, 200800 500200, 200800 500800)))"),
        ("d-golden", 1, g),
        ("d-point", 2, "POINT (155000 463000)"),
        ("d-line", 3, "LINESTRING (155000 463000, 156000 464000)"),
        ("d-mline", 4, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
        ("d-mpoint", 5, "MULTIPOINT ((155000 463000), (156000 464000))"),
        ("d-outside", 6, "POLYGON ((9000000 9000000, 9000001 9000000, 9000001 9000001))"),
        ("d-hole-collapse", 7, "POLYGON ((155000 463000, 155050 463000, 155050 463050, 155000 463050), "
                               "(155010 463010, 155040 463010, 155040 463040, 155010 463040))"),
        ("d-sliver", 8, "POLYGON ((155000 463000, 155000.0001 463000, 155000.0001 463000.0001))"),
        ("d-bowtie", 9, "POLYGON ((0 0, 100000 100000, 100000 0, 0 100000))"),
    ]
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows], "span_idx": [r[1] for r in rows], "wkt": [r[2] for r in rows]})
    want = _legacy_rows(pdf, tms, tm_ids, cfg)
    got = _new_rows(spark, pdf, tms, tm_ids, cfg)
    assert got == want
    assert any(r[0] == "d-multi" for r in got)


def test_stage_falls_back_on_3d_wkt(spark):
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [9]
    cfg = SnapConfig(ignore_outside_grid=True)
    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b"],
            "span_idx": [0, 0],
            "wkt": [
                "POLYGON ((155000 463000 1, 155050 463000 1, 155050 463050 1))",  # 3D
                "POLYGON ((155000 463000, 155050 463000, 155050 463050))",
            ],
        }
    )
    want = _legacy_rows(pdf, tms, tm_ids, cfg)
    got = _new_rows(spark, pdf, tms, tm_ids, cfg)
    assert got == want


def test_stage_keep_points_and_lines_and_reverse(spark):
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [5, 12]
    cfg = SnapConfig(ignore_outside_grid=True, keep_points_and_lines=True, reverse_winding_order=True)
    pdf = _spans_pdf(120)
    want = _legacy_rows(pdf, tms, tm_ids, cfg)
    got = _new_rows(spark, pdf, tms, tm_ids, cfg)
    assert got == want


def test_stage_wkt_text_stable_under_batch_composition(spark):
    """ADVICE r3: one odd row must not flip clean rows to the scalar
    formatter - the wkt TEXT of a clean row is byte-identical whether or
    not a 3D/EMPTY row shares its Arrow batch."""
    tms = load_embedded("NetherlandsRDNewQuad")
    tm_ids = [9]
    cfg = SnapConfig(ignore_outside_grid=True)
    clean = ("d-clean", 0, "POLYGON ((155000 463000, 156000 463000, 156000 464000, 155000 464000))")
    odd = ("d-odd", 1, "POLYGON ((155000 463000 1, 155050 463000 1, 155050 463050 1))")

    def wkt_of(rows, doc):
        pdf = pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "span_idx": [r[1] for r in rows], "wkt": [r[2] for r in rows]}
        )
        from texel_spark.operators.snap_tiles import snap_documents

        df = spark.createDataFrame(pdf).coalesce(1)  # one Arrow batch
        return sorted(
            r["wkt"] for r in snap_documents(df, tms, tm_ids, cfg).collect() if r["doc_id"] == doc
        )

    alone = wkt_of([clean], "d-clean")
    mixed = wkt_of([clean, odd], "d-clean")
    assert alone == mixed
    assert alone  # the clean row did emit
