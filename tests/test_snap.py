"""Snap kernel vs the reference's golden table tests (bit-for-bit).

Cases from /root/reference/snap/snap_test.go:20-800 (32 cases) plus the
sub-kernel fixtures (kmpDeduplicate, dedupeInnersOuters, ringContains).
"""

import pytest

from tests.golden_snap_cases import CASES
from texel_spark.grid.tms import load_embedded, simple_tms
from texel_spark.kernel.geomfuncs import ring_contains
from texel_spark.kernel.pointindex import OutsideGridError
from texel_spark.kernel.snap import (
    SnapConfig,
    _dedupe_inners_outers,
    _kmp_deduplicate,
    snap_polygon,
)


def _tms_for(spec):
    if isinstance(spec, tuple):
        return simple_tms(spec[1], spec[2])
    return load_embedded(spec)


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_snap_polygon_golden(case):
    tms = _tms_for(case["tms"])
    config = SnapConfig(**case["config"])
    if case.get("want_panic"):
        with pytest.raises(OutsideGridError):
            snap_polygon(case["polygon"], tms, case["tm_ids"], config)
        return
    got = snap_polygon(case["polygon"], tms, case["tm_ids"], config)
    want = case["want"]
    if want is None:  # case only pins down "does not panic"
        return
    if want == {}:
        assert got == {}
        return
    for tm_id, want_polys in want.items():
        got_polys = got.get(tm_id)
        norm = [[list(map(tuple, ring)) for ring in poly] for poly in (got_polys or [])]
        want_norm = [[list(map(tuple, ring)) for ring in poly] for poly in want_polys]
        assert norm == want_norm, f"tm {tm_id}:\n got: {norm}\nwant: {want_norm}"


def test_kmp_deduplicate_triangle_stays():
    # snap_test.go:832-863
    ring = [(2, 1), (1, 1), (1, 0), (1, 1), (0, 1), (1, 0), (1, 1)]
    want = [(2, 1), (1, 1), (0, 1), (1, 0), (1, 1)]
    assert _kmp_deduplicate([(float(x), float(y)) for x, y in ring]) == [
        (float(x), float(y)) for x, y in want
    ]


def _square_rings(n, is_outer):
    # snap_test.go:1056-1072
    outer = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    inner = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    return [list(outer if is_outer else inner) for _ in range(n)]


DUMMY = [(0.0, 0.0), (1.0, 0.0), (2.0, 1.0)]


@pytest.mark.parametrize(
    "n_out,n_in,want_out,want_in,dummy",
    [
        (0, 0, 0, 0, False),
        (1, 0, 1, 0, False),
        (1, 1, 1, 1, False),
        (2, 1, 1, 0, False),
        (2, 2, 1, 1, False),
        (0, 1, 0, 1, False),
        (1, 2, 0, 1, False),
        (2, 0, 2, 0, False),
        (0, 2, 0, 2, False),
        (3, 1, 2, 0, False),
        (1, 3, 0, 2, False),
        (1, 1, 1, 1, True),
        (3, 1, 2, 0, True),
    ],
)
def test_dedupe_inners_outers(n_out, n_in, want_out, want_in, dummy):
    # snap_test.go:865-1002
    outers = _square_rings(n_out, True)
    inners = _square_rings(n_in, False)
    if dummy:
        inners = inners + [list(DUMMY)]
    got_out, got_in = _dedupe_inners_outers(outers, inners)
    want_outers = _square_rings(want_out, True)
    want_inners = _square_rings(want_in, False)
    if dummy:
        want_inners = want_inners + [list(DUMMY)]
    assert got_out == want_outers
    assert got_in == want_inners


def test_ring_contains():
    # snap_test.go:802-830
    ring = [(0.25, 3.25), (3.25, 0.25), (6.25, 3.25), (3.25, 6.25)]
    assert ring_contains(ring, (2.25, 3.25)) == (True, False)
