"""pip_join 8->32 anti-scaling investigation (VERDICT r2 item 2).

Runs pip_join variants at two parallelism levels in separate JVMs and
prints per-variant wall times, so the non-scaling piece can be isolated:

  base      - exactly as bench.py runs it (range cpus*4 partitions)
  parts1x   - range partitioned to exactly `cpus`
  parts16x  - range partitioned to cpus*16
  noaqe     - AQE disabled
  nocount   - sum(event_id) instead of count (same scan, different agg)
  probe     - broadcast-join probe only, no PIP filter

Usage: python3 tools/bench_pip_scaling.py [n_low=8] [n_high=32] [rows=40000000]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from texel_spark.operators import spatial_queries as sq
from texel_spark.session import get_spark

cpus = {cpus}
rows = {rows}
spark = get_spark(app_name="pip-scaling", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 16))
spark.sparkContext.setLogLevel("ERROR")
nation = spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
nation.count()

def ev(parts):
    return spark.range(0, rows, 1, parts).withColumnRenamed("id", "event_id")

variants = {{}}

def measure(name, make_df, reps=3):
    best = None
    for _ in range(reps):
        df = make_df()
        t0 = time.perf_counter()
        df.count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    variants[name] = round(best, 3)

# warm
sq.pip_join(ev(cpus), nation).count()

measure("base", lambda: sq.pip_join(ev(cpus * 4), nation))
measure("parts1x", lambda: sq.pip_join(ev(cpus), nation))
measure("parts16x", lambda: sq.pip_join(ev(cpus * 16), nation))

spark.conf.set("spark.sql.adaptive.enabled", "false")
measure("noaqe", lambda: sq.pip_join(ev(cpus * 4), nation))
spark.conf.set("spark.sql.adaptive.enabled", "true")

# scan+project only (no join): isolates the point-generation cost
measure("scanonly", lambda: sq.points_from_events(ev(cpus * 4)).select(F.sum("px")))

print("RESULT " + json.dumps({{"cpus": cpus, "variants": variants}}))
spark.stop()
"""


def run(cpus: int, rows: int) -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, rows=rows)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-2000:])


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000_000
    lo = run(n_low, rows)
    hi = run(n_high, rows)
    report = {"low": lo, "high": hi}
    for k in lo["variants"]:
        l, h = lo["variants"][k], hi["variants"].get(k)
        report.setdefault("ratio_low_over_high", {})[k] = round(l / h, 3) if h else None
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
