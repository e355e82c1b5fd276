"""Transcribe the EPSG axis-order registry data into a JSON resource.

The reference ships this as a generated Go map (tms20/epsg_axis_order.go,
"Extracted from EPSG database v10.096") - PUBLIC EPSG registry content,
not code.  We carry the same facts as data: a JSON file with two sorted
code lists, loaded by texel_spark.grid.tms at import.

Usage: python3 tools/extract_epsg_axis_order.py [go_file] [out_json]
"""

import json
import re
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tms20/epsg_axis_order.go"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "texel_spark/grid/epsg_axis_order.json"
    )
    latlon, lonlat = [], []
    rx = re.compile(r"^\s*(\d+):\s*(true|false),\s*$")
    with open(src) as f:
        for line in f:
            m = rx.match(line)
            if m:
                (latlon if m.group(2) == "true" else lonlat).append(int(m.group(1)))
    latlon.sort()
    lonlat.sort()
    assert len(latlon) + len(lonlat) > 6000, "parse looks incomplete"
    assert not (set(latlon) & set(lonlat))
    with open(dst, "w") as f:
        json.dump(
            {
                "source": "EPSG database v10.096 (public registry; via PDOK/texel tms20/epsg_axis_order.go)",
                "axes_are_latlon": latlon,
                "axes_are_lonlat": lonlat,
            },
            f,
            separators=(",", ":"),
        )
    print(f"{dst}: {len(latlon)} lat/lon + {len(lonlat)} lon/lat codes")


if __name__ == "__main__":
    main()
