"""Direct pins for the reference quirks preserved on purpose (PARITY.md §2.3a).

Each test here fails if its quirk is "fixed" to textbook behavior; the
broader golden suites (tests/test_snap.py, tests/test_tms_json.py) fail
too, but these name the quirk explicitly so nobody trips over it.
"""

import dataclasses

import pytest

from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.geomfuncs import COLINEAR, COUNTER_CLOCKWISE, winding_of, winding_of_shoelace
from texel_spark.kernel.pointindex import segment_intersect


def test_segment_intersect_returns_ordinate_zero_twice():
    """intgeom.SegmentIntersect (intgeom/intgeom.go:57-61) builds the
    returned point from ordinate 0 twice: the intersection of a
    horizontal line at y=0 with a vertical line at x=5 reports (5, 5),
    not (5, 0).  line_intersects' tip-touch exceptions compare against
    this value, so parity requires it exactly."""
    horiz = ((0, 0), (100_000_000_000, 0))  # y = 0, fixed-point 1e10
    vert = ((50_000_000_000, -50_000_000_000), (50_000_000_000, 50_000_000_000))  # x = 5
    pt, ok = segment_intersect(horiz, vert)
    assert ok
    assert pt == (50_000_000_000, 50_000_000_000)  # (x, x) — NOT (x, y=0)


def test_winding_colinear_at_rightmost_lowest_beats_shoelace():
    """go-spatial winding.Order{}.OfPoints samples only the
    rightmost-lowest vertex; a doubled-back run through it yields
    COLINEAR even when the shoelace sum is decisively signed.  The snap
    kernel treats COLINEAR as "already correctly wound"
    (snap_test.go:589-640 goldens depend on it)."""
    ring = [(0.0, 0.0), (2.0, 0.0), (1.0, 0.0), (1.0, 1.0)]
    assert winding_of(ring) == COLINEAR
    assert winding_of_shoelace(ring) == COUNTER_CLOCKWISE  # a "fix" would return this


def test_latlon_axes_regex_matches_xy_style_names():
    """tms20.go:543-554: the "latLon" regex's alternatives are x,y-style
    names (e,n / x,y / lon,lat), so orderedAxes ["X","Y"] resolves as
    lat/lon=True and to_xy_point SWAPS.  Harmless for symmetric origins;
    faithful to the reference.  Only reachable when the EPSG table does
    not already decide the order (unknown authority here)."""
    rd = load_embedded("NetherlandsRDNewQuad")
    crs = dataclasses.replace(rd.crs, uri="http://www.example.com/def/crs/FOO/0/12345")
    tms = dataclasses.replace(rd, crs=crs, ordered_axes=("X", "Y"))
    assert tms.to_xy_point((1.0, 2.0)) == (2.0, 1.0)  # swapped by the quirk

    # and with no orderedAxes either, the unknown CRS fails loudly
    tms_none = dataclasses.replace(rd, crs=crs, ordered_axes=())
    with pytest.raises(ValueError, match="FOO"):
        tms_none.to_xy_point((1.0, 2.0))


def test_kmp_deduplicate_skips_triangular_spike():
    """snap.go:675-677 reassigns i = table[i] BEFORE recomputing m; the
    observable contract is pinned by
    tests/test_snap.py::test_kmp_deduplicate_triangle_stays (a triangle
    spike survives dedupe).  Re-assert the core case here so the quirk
    registry has a local guard."""
    from texel_spark.kernel.snap import _kmp_search

    # pattern with a non-trivial failure function scanning past partial matches
    corpus = list("ababcabcabab")
    assert _kmp_search(corpus, list("abcabc")) == 2
    assert _kmp_search(corpus, list("abcaba")) == 5
    assert _kmp_search(corpus, list("abcabb")) == len(corpus)  # not present
