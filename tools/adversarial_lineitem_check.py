"""Differential oracle battery over a DIRTY lineitem table.

Third member of the adversarial-fixture family (docs, embeddings,
now relational): real fact tables carry nulls in measures and dates
and out-of-range values long before anyone validates them. This tool
rewrites lineitem with planted dirt — NULL l_quantity / l_discount /
l_tax / l_extendedprice / l_shipdate / l_returnflag on disjoint row
slices, zero and negative quantities, 1e9-scale prices, far-future
and epoch-edge ship dates — while keeping every KEY column intact
(joins still resolve), then re-runs every ORACLED query whose SQL
touches `lineitem`. Spark's three-valued logic, null-skipping
aggregates, and date comparisons must keep agreeing with DuckDB's.

    python tools/adversarial_lineitem_check.py [seed]

Sig-digit compare (ORACLE_SIG_DIGITS=9): the planted 1e9 prices push
money sums past the fixed-6dp envelope exactly like the sf1 sweep.
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.001"


def build_fixture(tmp: str, seed: int) -> None:
    import datetime

    import pyarrow.parquet as pq

    rng = random.Random(seed)
    t = pq.read_table(f"{BASE_SF}/lineitem.parquet")
    pdf = t.to_pandas()
    n = len(pdf)
    idx = list(range(n))
    rng.shuffle(idx)

    def slice_of(frac_from, frac_to):
        return idx[int(n * frac_from) : int(n * frac_to)]

    # disjoint 2% slices of planted dirt; 86% of rows stay clean
    pdf.loc[slice_of(0.00, 0.02), "l_quantity"] = None
    pdf.loc[slice_of(0.02, 0.04), "l_discount"] = None
    pdf.loc[slice_of(0.04, 0.06), "l_tax"] = None
    pdf.loc[slice_of(0.06, 0.08), "l_extendedprice"] = None
    pdf.loc[slice_of(0.08, 0.10), "l_shipdate"] = None
    pdf.loc[slice_of(0.10, 0.12), "l_returnflag"] = None
    pdf.loc[slice_of(0.12, 0.13), "l_quantity"] = 0.0
    pdf.loc[slice_of(0.13, 0.14), "l_quantity"] = -5.0
    pdf.loc[slice_of(0.14, 0.15), "l_extendedprice"] = 1.0e9
    pdf.loc[slice_of(0.15, 0.16), "l_extendedprice"] = 0.0
    pdf.loc[slice_of(0.16, 0.17), "l_discount"] = 1.0   # 100% discount
    pdf.loc[slice_of(0.17, 0.18), "l_shipdate"] = datetime.datetime(2099, 12, 31)
    pdf.loc[slice_of(0.18, 0.19), "l_shipdate"] = datetime.datetime(1970, 1, 1)
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(pdf, schema=t.schema), f"{tmp}/lineitem.parquet"
    )
    for f in os.listdir(BASE_SF):
        if f != "lineitem.parquet":
            dst = os.path.join(tmp, f)
            src = os.path.join(BASE_SF, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def lineitem_touching_oracled() -> list[str]:
    from parquet_pipeline_spark import registry

    registry.load_all()
    return sorted(
        name for name, sql in registry.ORACLES.items() if "lineitem" in sql
    )


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_li_")
    build_fixture(tmp, seed)
    names = lineitem_touching_oracled()
    print(f"adversarial fixture at {tmp} (seed {seed}); {len(names)} queries")
    env = dict(os.environ, ORACLE_SF_DIR=tmp, ORACLE_SIG_DIGITS="9")
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", *names],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
