"""WKB + GeoPackage-binary geometry codec.

The reference reads/writes GPKG geometry BLOBs: an 8-byte-ish GP header
(magic, version, flags, srs_id, optional envelope) followed by standard
WKB (processing/gpkg/gpkg.go:82-146, 236-244).  This codec implements the
subset the engine's data plane uses: Point, LineString, Polygon,
MultiPolygon, little-endian, 2D.

Runs inside Arrow-batched stages; struct packing is bulk via the struct
module on whole coordinate runs (no per-double Python calls).
"""

from __future__ import annotations

import struct

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_GP_MAGIC = b"GP"


def _pack_ring(ring) -> bytes:
    pts = list(ring)
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])  # WKB rings are closed
    flat = [o for p in pts for o in (p[0], p[1])]
    return struct.pack("<I", len(pts)) + struct.pack(f"<{len(flat)}d", *flat)


def polygon_to_wkb(rings) -> bytes:
    out = [struct.pack("<BI", 1, WKB_POLYGON), struct.pack("<I", len(rings))]
    out.extend(_pack_ring(r) for r in rings)
    return b"".join(out)


def multipolygon_to_wkb(polygons) -> bytes:
    out = [struct.pack("<BI", 1, WKB_MULTIPOLYGON), struct.pack("<I", len(polygons))]
    out.extend(polygon_to_wkb(p) for p in polygons)
    return b"".join(out)


def point_to_wkb(pt) -> bytes:
    return struct.pack("<BI", 1, WKB_POINT) + struct.pack("<2d", pt[0], pt[1])


def linestring_to_wkb(pts) -> bytes:
    flat = [o for p in pts for o in (p[0], p[1])]
    return struct.pack("<BI", 1, WKB_LINESTRING) + struct.pack("<I", len(pts)) + struct.pack(f"<{len(flat)}d", *flat)


def multipoint_to_wkb(pts) -> bytes:
    out = [struct.pack("<BI", 1, WKB_MULTIPOINT), struct.pack("<I", len(pts))]
    out.extend(point_to_wkb(p) for p in pts)
    return b"".join(out)


def multilinestring_to_wkb(lines) -> bytes:
    out = [struct.pack("<BI", 1, WKB_MULTILINESTRING), struct.pack("<I", len(lines))]
    out.extend(linestring_to_wkb(ln) for ln in lines)
    return b"".join(out)


def geometry_to_wkb(kind: str, coords) -> bytes:
    if kind == "polygon":
        return polygon_to_wkb(coords)
    if kind == "multipolygon":
        return multipolygon_to_wkb(coords)
    if kind == "point":
        return point_to_wkb(coords)
    if kind == "linestring":
        return linestring_to_wkb(coords)
    if kind == "multipoint":
        return multipoint_to_wkb(coords)
    if kind == "multilinestring":
        return multilinestring_to_wkb(coords)
    raise ValueError(kind)


def parse_wkb(buf: bytes, offset: int = 0):
    """Returns (kind, coords, end_offset); ring closing point dropped
    (like go-spatial LinearRings semantics the kernel expects)."""
    byte_order = buf[offset]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(f"{endian}I", buf, offset + 1)
    gtype &= 0xFF  # strip Z/M/SRID flags we don't support anyway
    o = offset + 5

    def read_ring(o, drop_close):
        (n,) = struct.unpack_from(f"{endian}I", buf, o)
        o += 4
        flat = struct.unpack_from(f"{endian}{2 * n}d", buf, o)
        o += 16 * n
        pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]
        if drop_close and len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        return pts, o

    if gtype == WKB_POINT:
        x, y = struct.unpack_from(f"{endian}2d", buf, o)
        return "point", (x, y), o + 16
    if gtype == WKB_LINESTRING:
        pts, o = read_ring(o, drop_close=False)
        return "linestring", pts, o
    if gtype == WKB_POLYGON:
        (nr,) = struct.unpack_from(f"{endian}I", buf, o)
        o += 4
        rings = []
        for _ in range(nr):
            r, o = read_ring(o, drop_close=True)
            rings.append(r)
        return "polygon", rings, o
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING):
        (nm,) = struct.unpack_from(f"{endian}I", buf, o)
        o += 4
        members = []
        for _ in range(nm):
            _kind, coords, o = parse_wkb(buf, o)
            members.append(coords)
        return ("multipoint" if gtype == WKB_MULTIPOINT else "multilinestring"), members, o
    if gtype == WKB_MULTIPOLYGON:
        (np_,) = struct.unpack_from(f"{endian}I", buf, o)
        o += 4
        polys = []
        for _ in range(np_):
            kind, coords, o = parse_wkb(buf, o)
            if kind != "polygon":
                raise ValueError(f"multipolygon member is {kind}")
            polys.append(coords)
        return "multipolygon", polys, o
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def gpkg_blob_to_geometry(blob: bytes):
    """GPKG binary header -> (kind, coords) (GeoPackage spec section 2.1.3)."""
    if blob[:2] != _GP_MAGIC:
        raise ValueError("not a GPKG geometry blob")
    flags = blob[3]
    envelope_kind = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[envelope_kind]
    kind, coords, _ = parse_wkb(blob, 8 + env_len)
    return kind, coords


def geometry_to_gpkg_blob(kind: str, coords, srs_id: int = 0) -> bytes:
    """Geometry -> GPKG blob, no envelope, little-endian header."""
    header = _GP_MAGIC + bytes([0, 0b00000001]) + struct.pack("<i", srs_id)
    return header + geometry_to_wkb(kind, coords)
