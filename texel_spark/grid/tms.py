"""OGC Tile Matrix Set 2.0 model, embedded grids, and tile math.

Re-creates the reference's tms20 package surface that the engine needs
(/root/reference/tms20/tms20.go): grid metadata, quad-tree validation,
matrix bounding boxes, and point<->tile conversion (FromNative/ToNative,
tms20.go:664-747).  Grid definitions are tiny static data: at job time a
``TileMatrixSet`` is broadcast to executors (sc.broadcast), never shuffled.

Embedded grid numbers come from the public OGC Tile Matrix Set registry
(https://www.ogc.org/standard/tms/); cell sizes are kept as the registry's
literal decimals because deeper levels are truncated, not exact halves.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from .fixedpoint import f_between_inc, from_point, round_float

COORD_PRECISION = 9
STANDARDIZED_RENDERING_PIXEL_SIZE = 0.00028

TOP_LEFT = "topLeft"
BOTTOM_LEFT = "bottomLeft"

# epsg code -> axes are lat/lon (tms20/epsg_axis_order.go, generated from the
# public EPSG registry; only the codes our grids use)
EPSG_AXES_ARE_LATLON = {
    2193: True,
    3035: True,
    3395: False,
    3857: False,
    3978: False,
    4326: True,
    5041: False,
    5042: False,
    5482: True,
    28992: False,
    32631: False,
}

_CRS_URI_URL_RE = re.compile(r"https?://.+/def/crs/(?P<authority>[^/]+)/(?P<version>[^/]*)/(?P<code>[^/]+)$")
_CRS_URI_URN_RE = re.compile(r"^urn:ogc:def:crs:(?P<authority>[^:]+):(?P<version>[^:]*):(?P<code>[^:]+)$")
_LATLON_AXES_RE = re.compile(r"^(e,n|x,y|lon,lat|e\(x\),n\(y\))")
_LONLAT_AXES_RE = re.compile(r"^(n,e|y,x|lat|lon)")


@dataclass(frozen=True)
class CRS:
    uri: str = ""

    def _parts(self):
        for rx in (_CRS_URI_URL_RE, _CRS_URI_URN_RE):
            m = rx.match(self.uri)
            if m:
                return m.group("authority"), m.group("version"), m.group("code")
        return "", "", ""

    @property
    def authority(self) -> str:
        return self._parts()[0]

    @property
    def version(self) -> str:
        return self._parts()[1]

    @property
    def code(self) -> str:
        return self._parts()[2]


@dataclass(frozen=True)
class TileMatrix:
    id: str
    scale_denominator: float
    cell_size: float
    point_of_origin: tuple[float, float]
    tile_width: int = 256
    tile_height: int = 256
    matrix_width: int = 1
    matrix_height: int = 1
    corner_of_origin: str = TOP_LEFT


@dataclass(frozen=True)
class TileMatrixSet:
    id: str
    crs: CRS
    ordered_axes: tuple[str, ...]
    tile_matrices: dict[int, TileMatrix] = field(default_factory=dict)

    # -- axis order (tms20.go:504-554) ------------------------------------
    def srid(self) -> int:
        code = self.crs.code
        return int(code)  # raises like Go panics on non-numeric

    def _is_lat_lon(self) -> bool:
        crs = self.crs
        authority, version, code = crs.authority, crs.version, crs.code
        if authority == "OGC" and version == "1.3" and code == "CRS84":
            return False
        if authority.lower() != "epsg":
            raise ValueError(f'could not determine axis order for unknown crs authority "{authority}"')
        icode = int(code)
        if icode not in EPSG_AXES_ARE_LATLON:
            raise ValueError(f"unknown axis order for epsg:{icode}")
        return EPSG_AXES_ARE_LATLON[icode]

    def _axis_order_is_lat_lon(self) -> bool:
        if len(self.ordered_axes) < 2:
            raise ValueError("could not determine if (empty or single) ordered axes are in lat/lon order")
        s = f"{self.ordered_axes[0]},{self.ordered_axes[1]}".lower()
        # NB: faithful to the reference: the "latLon" regex actually matches
        # x,y-style names and yields True (tms20.go:543-554); harmless for
        # symmetric origins, required for parity.
        if _LATLON_AXES_RE.match(s):
            return True
        if _LONLAT_AXES_RE.match(s):
            return False
        raise ValueError("could not determine if ordered axes are in lat/lon order")

    def to_xy_point(self, point: tuple[float, float]) -> tuple[float, float]:
        """Ensure XY order (tms20.go:527-541)."""
        try:
            is_lat_lon = self._is_lat_lon()
        except ValueError:
            is_lat_lon = self._axis_order_is_lat_lon()
        if is_lat_lon:
            return (point[1], point[0])
        return (point[0], point[1])

    # -- matrix geometry (tms20.go:750-791) -------------------------------
    def matrix_size(self, tm_id: int) -> tuple[float, float]:
        tm = self.tile_matrices[tm_id]
        width = round_float(float(tm.matrix_width) * float(tm.tile_width) * tm.cell_size, COORD_PRECISION)
        height = round_float(float(tm.matrix_height) * float(tm.tile_height) * tm.cell_size, COORD_PRECISION)
        return width, height

    def matrix_bounding_box(self, tm_id: int) -> tuple[tuple[float, float], tuple[float, float]]:
        """Returns (bottom_left, top_right) in native CRS (tms20.go:760-791)."""
        if tm_id not in self.tile_matrices:
            raise KeyError(f"tile matrix with id {tm_id} not found")
        tm = self.tile_matrices[tm_id]
        grid_w, grid_h = self.matrix_size(tm_id)
        origin_xy = self.to_xy_point(tm.point_of_origin)
        min_x = origin_xy[0]
        max_x = round_float(min_x + grid_w, COORD_PRECISION)
        if tm.corner_of_origin == BOTTOM_LEFT:
            min_y = origin_xy[1]
            max_y = round_float(min_y + grid_h, COORD_PRECISION)
        else:
            max_y = origin_xy[1]
            min_y = round_float(max_y - grid_h, COORD_PRECISION)
        return (min_x, min_y), (max_x, max_y)

    # -- tile assignment (tms20.go:656-747) -------------------------------
    def size(self, zoom: int):
        tm = self.tile_matrices.get(zoom)
        if tm is None:
            return None
        return (zoom, tm.matrix_width, tm.matrix_height)

    def from_native(self, zoom: int, pt: tuple[float, float]):
        """Point -> (zoom, tx, ty) tile or None if out of bounds (tms20.go:664-712)."""
        tm = self.tile_matrices.get(zoom)
        if tm is None:
            return None
        origin_xy = self.to_xy_point(tm.point_of_origin)
        tile_size_x = float(tm.tile_width) * tm.cell_size
        x = (pt[0] - origin_xy[0]) / tile_size_x
        if x < 0:
            return None
        ux = int(x)
        if ux >= tm.matrix_width:
            return None
        tile_size_y = float(tm.tile_height) * tm.cell_size
        if tm.corner_of_origin == BOTTOM_LEFT:
            y = (pt[1] - origin_xy[1]) / tile_size_y
        else:
            y = (origin_xy[1] - pt[1]) / tile_size_y
        if y < 0:
            return None
        uy = int(y)
        if uy >= tm.matrix_height:
            return None
        return (zoom, ux, uy)

    def to_native(self, zoom: int, tx: int, ty: int):
        """Tile -> top-left native point (tms20.go:714-747)."""
        tm = self.tile_matrices.get(zoom)
        if tm is None:
            return None
        if tx > tm.matrix_width or ty > tm.matrix_height:
            return None
        origin_xy = self.to_xy_point(tm.point_of_origin)
        tile_size_x = float(tm.tile_width) * tm.cell_size
        out_x = round_float(origin_xy[0] + float(tx) * tile_size_x, COORD_PRECISION)
        tile_size_y = float(tm.tile_height) * tm.cell_size
        if tm.corner_of_origin == BOTTOM_LEFT:
            out_y = round_float(origin_xy[1] + float(ty + 1) * tile_size_y, COORD_PRECISION)
        else:
            out_y = round_float(origin_xy[1] - float(ty) * tile_size_y, COORD_PRECISION)
        return (out_x, out_y)

    def int_root_extent(self, tm_id: int = 0) -> tuple[int, int, int, int]:
        """Fixed-point (minX, minY, maxX, maxY) of a matrix bbox."""
        bl, tr = self.matrix_bounding_box(tm_id)
        ibl, itr = from_point(bl), from_point(tr)
        return (ibl[0], ibl[1], itr[0], itr[1])

    def level_diff(self, pixel_resolution: int = 16) -> int:
        """snap level offset: log2(tileWidth)+log2(subpixels) (snap.go:76-86)."""
        root = self.tile_matrices[0]
        return int(math.log2(float(root.tile_width))) + int(math.log2(float(pixel_resolution)))


def is_quad_tree(tms: TileMatrixSet) -> None:
    """Raise ValueError unless the TMS is a proper quad tree (pointindex.go:515-563)."""
    prev_id: int | None = None
    prev: TileMatrix | None = None
    for tm_id in sorted(tms.tile_matrices):
        tm = tms.tile_matrices[tm_id]
        if tm.matrix_height != tm.matrix_width:
            raise ValueError("tile matrix height should be same as width: " + tm.id)
        if tm.tile_height != tm.tile_width:
            raise ValueError("tiles should be square: " + tm.id)
        if int(tm.id) != tm_id:
            raise ValueError("tile matrix ID should string representation of its index in the array: " + tm.id)
        if prev is not None:
            if tm_id != prev_id + 1:
                raise ValueError("tile matrix IDs should be a range with step 1 starting with 0")
            if tm.point_of_origin != prev.point_of_origin:
                raise ValueError("tile matrixes should have the same point of origin: " + tm.id)
            if tm.corner_of_origin != prev.corner_of_origin:
                raise ValueError("tile matrixes should have the same corner of origin: " + tm.id)
            if tm.tile_height != prev.tile_height:
                raise ValueError("tile matrix tiles should stay the same size: " + tm.id)
            if tm.matrix_height != 2 * prev.matrix_height:
                raise ValueError("tile matrix should double in size each level: " + tm.id)
            if not f_between_inc(prev.cell_size / tm.cell_size, 1.99, 2.01):
                raise ValueError("cell size should half each level: " + tm.id)
        prev_id, prev = tm_id, tm
    return None


def deviation_stats(tms: TileMatrixSet, deepest_tm_id: int) -> tuple[float, float]:
    """Fixed-point resolution error at the deepest level, in (units, pixels).

    Mirrors pointindex.DeviationStats (pointindex.go:569-603) minus the
    pretty-printing; used as a driver-side preflight (warn if >= 1 px).
    """
    bl, tr = tms.matrix_bounding_box(0)
    ext = tms.int_root_extent(0)
    deepest_level = deepest_tm_id + tms.level_diff()
    deepest_size = 1 << deepest_level
    float_span_x = tr[0] - bl[0]
    float_res = float_span_x / float(deepest_size)
    int_res = (ext[2] - ext[0]) // deepest_size
    float_recalc_max_x = float_res * float(deepest_size)
    int_recalc_max_x = float(int_res * deepest_size) / 1e10 if int_res else 0.0
    dev_units = float_recalc_max_x - int_recalc_max_x
    dev_pixels = dev_units / float_res
    return dev_units, dev_pixels


def _quad_grid(
    tms_id: str,
    crs_uri: str,
    ordered_axes: tuple[str, ...],
    origin: tuple[float, float],
    cell_sizes: list[float],
    scale_denominators: list[float] | None = None,
    tile_size: int = 256,
    corner: str = TOP_LEFT,
) -> TileMatrixSet:
    matrices = {}
    for z, cs in enumerate(cell_sizes):
        sd = scale_denominators[z] if scale_denominators else cs / STANDARDIZED_RENDERING_PIXEL_SIZE
        matrices[z] = TileMatrix(
            id=str(z),
            scale_denominator=sd,
            cell_size=cs,
            point_of_origin=origin,
            tile_width=tile_size,
            tile_height=tile_size,
            matrix_width=1 << z,
            matrix_height=1 << z,
            corner_of_origin=corner,
        )
    return TileMatrixSet(id=tms_id, crs=CRS(crs_uri), ordered_axes=ordered_axes, tile_matrices=matrices)


# Cell sizes as published in the OGC TMS 2.0 registry (deep levels are
# truncated decimals there, so they are data, not computed halves).
_WEB_MERCATOR_CELL_SIZES = [
    156543.033928041, 78271.5169640204, 39135.7584820102, 19567.8792410051,
    9783.93962050256, 4891.96981025128, 2445.98490512564, 1222.99245256282,
    611.49622628141, 305.748113140704, 152.874056570352, 76.4370282851762,
    38.2185141425881, 19.109257071294, 9.55462853564703, 4.77731426782351,
    2.38865713391175, 1.19432856695587, 0.597164283477939, 0.29858214173897,
    0.149291070869485, 0.0746455354347424, 0.0373227677173712,
    0.0186613838586856, 0.0093306919293428,
]
_WEB_MERCATOR_SCALE_DENOMS = [
    559082264.028717, 279541132.014358, 139770566.007179, 69885283.0035897,
    34942641.5017948, 17471320.7508974, 8735660.37544871, 4367830.18772435,
    2183915.09386217, 1091957.54693108, 545978.773465544, 272989.386732772,
    136494.693366386, 68247.346683193, 34123.6733415964, 17061.8366707982,
    8530.91833539913, 4265.45916769956, 2132.72958384978, 1066.36479192489,
    533.182395962445, 266.591197981222, 133.295598990611, 66.6477994953056,
    33.3238997476528,
]
_RD_CELL_SIZES = [
    3440.64, 1720.32, 860.16, 430.08, 215.04, 107.52, 53.76, 26.88, 13.44,
    6.72, 3.36, 1.68, 0.84, 0.42, 0.21, 0.105, 0.0525,
]
_RD_SCALE_DENOMS = [
    12288000.0, 6144000.0, 3072000.0, 1536000.0, 768000.0, 384000.0,
    192000.0, 96000.0, 48000.0, 24000.0, 12000.0, 6000.0, 3000.0, 1500.0,
    750.0, 375.0, 187.5,
]
_LAEA_CELL_SIZES = [
    17578.125, 8789.0625, 4394.53125, 2197.265625, 1098.6328125,
    549.31640625, 274.658203125, 137.3291015625, 68.6645507812,
    34.3322753906, 17.1661376953, 8.5830688477, 4.2915344238, 2.1457672119,
    1.072883606, 0.536441803,
]

_EMBEDDED: dict[str, TileMatrixSet] = {}


def _register(tms: TileMatrixSet) -> TileMatrixSet:
    _EMBEDDED[tms.id] = tms
    return tms


NETHERLANDS_RD_NEW_QUAD = _register(_quad_grid(
    "NetherlandsRDNewQuad",
    "http://www.opengis.net/def/crs/EPSG/0/28992",
    ("X", "Y"),
    (-285401.92, 903401.92),
    _RD_CELL_SIZES,
    _RD_SCALE_DENOMS,
))
WEB_MERCATOR_QUAD = _register(_quad_grid(
    "WebMercatorQuad",
    "http://www.opengis.net/def/crs/EPSG/0/3857",
    ("X", "Y"),
    (-20037508.3427892, 20037508.3427892),
    _WEB_MERCATOR_CELL_SIZES,
    _WEB_MERCATOR_SCALE_DENOMS,
))
EUROPEAN_ETRS89_LAEA_QUAD = _register(_quad_grid(
    "EuropeanETRS89_LAEAQuad",
    "http://www.opengis.net/def/crs/EPSG/0/3035",
    ("Y", "X"),
    (5500000.0, 2000000.0),
    _LAEA_CELL_SIZES,
))
WORLD_MERCATOR_WGS84_QUAD = _register(_quad_grid(
    "WorldMercatorWGS84Quad",
    "http://www.opengis.net/def/crs/EPSG/0/3395",
    ("E", "N"),
    (-20037508.3427892, 20037508.3427892),
    _WEB_MERCATOR_CELL_SIZES,
))


def load_embedded(tms_id: str) -> TileMatrixSet:
    return _EMBEDDED[tms_id]


def simple_tms(deepest_tm_id: int, cell_size: float) -> TileMatrixSet:
    """Synthetic test grid: 1x1-px tiles, bottomLeft origin (0,0), cellSize
    doubling toward z0 (snap/snap_test.go:1004-1030)."""
    matrices = {}
    for tm_id in range(deepest_tm_id + 1):
        tm_cell_size = cell_size * float(1 << (deepest_tm_id - tm_id))
        matrices[tm_id] = TileMatrix(
            id=str(tm_id),
            scale_denominator=tm_cell_size / STANDARDIZED_RENDERING_PIXEL_SIZE,
            cell_size=tm_cell_size,
            point_of_origin=(0.0, 0.0),
            tile_width=1,
            tile_height=1,
            matrix_width=1,
            matrix_height=1,
            corner_of_origin=BOTTOM_LEFT,
        )
    return TileMatrixSet(id=f"simple:{deepest_tm_id}:{cell_size}", crs=CRS(""), ordered_axes=("X", "Y"), tile_matrices=matrices)
