"""Point index vs the reference's unit tests.

Golden values from /root/reference/pointindex/pointindex_test.go.
"""

import pytest

from texel_spark.grid.fixedpoint import ONE, from_ord, from_point
from texel_spark.grid import morton
from texel_spark.grid.tms import load_embedded
from texel_spark.kernel.pointindex import (
    PointIndex,
    contains_point,
    line_intersects,
)


def simple_ix(deepest_level: int, cell_size: float) -> PointIndex:
    """pointindex_test.go:520-537."""
    deepest_size = 1 << deepest_level
    span = cell_size * float(deepest_size)
    extent = (0, 0, from_ord(span), from_ord(span))
    return PointIndex(extent, deepest_level)


def ipt(x: float, y: float):
    return (from_ord(x), from_ord(y))


@pytest.mark.parametrize(
    "pt,want",
    [
        ((0.5, 0.5), True),
        ((0.5, 0.0), True),
        ((0.0, 0.5), True),
        ((1.0, 0.5), False),
        ((0.5, 1.0), False),
        ((0.0, 0.0), True),
        ((1.0, 0.0), False),
        ((1.0, 1.0), False),
        ((0.0, 1.0), False),
    ],
)
def test_contains_point_half_open(pt, want):
    # pointindex_test.go:27-88
    assert contains_point(ipt(*pt), (0, 0, ONE, ONE)) is want


def test_quadrant_extent_and_centroid():
    # pointindex_test.go:90-133
    ix = simple_ix(0, 1.0)
    extent, centroid = ix._quadrant_extent_and_centroid(0, 0, 0, (0, 0, ONE, ONE))
    assert extent == (0, 0, ONE, ONE)
    assert centroid == (ONE // 2, ONE // 2)


def _quad(ix, level, z):
    assert z in ix.cells[level]
    return ix.quadrant_at(level, z)


def test_insert_point_deep():
    # pointindex_test.go:186-220 "deep": simple(3, 0.5), point (2.8, 3.2)
    ix = simple_ix(3, 0.5)
    ix.insert_point((2.8, 3.2))
    assert ix.cells[0] == {0}
    assert ix.cells[1] == {0b11}
    assert ix.cells[2] == {0b1110}
    assert ix.cells[3] == {0b111001}
    q = _quad(ix, 3, 0b111001)
    assert q.extent == (from_ord(2.5), from_ord(3.0), from_ord(3.0), from_ord(3.5))
    assert q.centroid == ipt(2.75, 3.25)
    q2 = _quad(ix, 2, 0b1110)
    assert q2.extent == (from_ord(2.0), from_ord(3.0), from_ord(3.0), from_ord(4.0))
    assert q2.centroid == ipt(2.5, 3.5)


def test_insert_point_deeper():
    # pointindex_test.go:222-266: simple(5, 0.5), point (2.0, 6.0)
    ix = simple_ix(5, 0.5)
    ix.insert_point((2.0, 6.0))
    assert ix.cells[3] == {morton.to_z(1, 3)}
    assert ix.cells[4] == {morton.to_z(2, 6)}
    assert ix.cells[5] == {morton.to_z(4, 12)}
    q = _quad(ix, 5, morton.to_z(4, 12))
    assert q.extent == (from_ord(2.0), from_ord(6.0), from_ord(2.5), from_ord(6.5))
    assert q.centroid == ipt(2.25, 6.25)


def test_insert_point_deepest_webmercator_fixed_point():
    # pointindex_test.go:284-341: fixed-point regressions on WebMercator z17
    tms = load_embedded("WebMercatorQuad")
    ix = PointIndex.from_tile_matrix_set(tms, 17)

    ix.insert_point((642743.3299, 6898063.027))
    assert len(ix.cells[ix.deepest_level]) == 1
    (z,) = ix.cells[ix.deepest_level]
    q = ix.quadrant_at(ix.deepest_level, z)
    assert z == 225954093760580854
    assert q.extent == (6427432856623948, 68980629641080914, 6427433603079302, 68980630387536268)
    assert q.centroid == (6427433229851625, 68980630014308591)

    ix2 = PointIndex.from_tile_matrix_set(tms, 17)
    ix2.insert_point((642743.4434337, 6898062.9994258))
    (z2,) = ix2.cells[ix2.deepest_level]
    q2 = ix2.quadrant_at(ix2.deepest_level, z2)
    assert z2 == 225954093760581026
    assert q2.extent == (6427434349534656, 68980629641080914, 6427435095990010, 68980630387536268)
    assert q2.centroid == (6427434722762333, 68980630014308591)


def test_insert_point_deepest_rd():
    tms = load_embedded("NetherlandsRDNewQuad")
    ix = PointIndex.from_tile_matrix_set(tms, 16)
    ix.insert_point((155000, 463000))
    (z,) = ix.cells[ix.deepest_level]
    q = ix.quadrant_at(ix.deepest_level, z)
    assert z == 0xC0000000000000
    assert q.extent == (
        from_ord(155000), from_ord(463000),
        from_ord(155000 + 0.00328125), from_ord(463000 + 0.00328125),
    )
    assert q.centroid == ipt(155000 + 0.00328125 / 2, 463000 + 0.00328125 / 2)


def _snap(ix, poly, line, ring_id=0, levels=None):
    ix.insert_polygon([[tuple(v) for v in ring] for ring in poly])
    if levels is None:
        levels = {ix.deepest_level}
    return ix.snap_closest_points(line, set(levels), ring_id)


def test_snap_closest_points_nowhere_close():
    ix = simple_ix(4, 0.5)
    got = _snap(ix, [[(0, 0), (0, 2), (2, 2), (2, 0)]], ((4.0, 4.0), (8.0, 8.0)))
    assert got == {}


def test_snap_closest_points_no_extra():
    ix = simple_ix(5, 0.5)
    got = _snap(
        ix,
        [[(0, 0), (0, 8), (8, 8), (8, 0)], [(2, 2), (6, 2), (6, 6), (2, 6)]],
        ((2.0, 2.0), (6.0, 2.0)),
        ring_id=1,
    )
    assert got == {5: [(2.25, 2.25), (6.25, 2.25)]}


def test_snap_closest_points_extra_point_scary_geom():
    # the canonical "add point to prevent intersection" fixture
    ix = simple_ix(4, 0.5)
    got = _snap(
        ix,
        [[(0, 5), (5, 4), (5, 0), (3, 0), (0, 2)], [(1, 3), (3, 3), (3, 1), (1.25, 1.25)]],
        ((3.0, 0.0), (0.0, 2.0)),
    )
    assert got == {4: [(3.25, 0.25), (1.25, 1.25), (0.25, 2.25)]}


def test_snap_closest_points_horizontal_line_rd():
    tms = load_embedded("NetherlandsRDNewQuad")
    ix = PointIndex.from_tile_matrix_set(tms, 14)
    p1 = (110906.87099999999918509, 504428.79999999998835847)
    p2 = (110907.64400000000023283, 504428.79999999998835847)
    got = _snap(ix, [[p1, p2]], (p1, p2), levels={14 + 8 + 4})
    assert got == {14 + 8 + 4: [(110906.8709375, 504428.8065625), (110907.6453125, 504428.8065625)]}


SQUARE_POLY = [[(1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5)]]


@pytest.mark.parametrize(
    "line,want",
    [
        (((0.0, 4.0), (1.0, 3.0)), {}),                            # corner topleft
        (((4.0, 4.0), (3.0, 3.0)), {}),                            # corner topright
        (((4.0, 0.0), (3.0, 1.0)), {}),                            # corner bottomright
        (((0.0, 0.0), (1.0, 1.0)), {2: [(1.5, 1.5)]}),             # corner bottomleft
        (((0.0, 3.0), (4.0, 3.0)), {}),                            # edge top
        (((3.0, 4.0), (3.0, 0.0)), {}),                            # edge right
        (((0.0, 1.0), (4.0, 1.0)), {2: [(1.5, 1.5), (2.5, 1.5)]}),  # edge bottom
        (((1.0, 0.0), (1.0, 4.0)), {2: [(1.5, 1.5), (1.5, 2.5)]}),  # edge left
    ],
)
def test_snap_closest_points_corner_and_edge_cases(line, want):
    # pointindex_test.go:404-466
    ix = simple_ix(2, 1.0)
    assert _snap(ix, SQUARE_POLY, line) == want


def test_line_intersects_integer_false_positive_regression():
    # pointindex_test.go:487-518
    extent = (135196160000000, 516981760000000, 135202880000000, 516988480000000)
    line = ((135201147999999, 516929654000000), (135145991000000, 516996354000000))
    assert line_intersects(line, extent) is False
