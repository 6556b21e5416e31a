"""Differential oracle battery over a DIRTY orders table.

Fifth adversarial fixture: orders is the most-joined fact slice (55
oracled queries touch it), so its dirt stresses join null-handling,
date windows, status CASE logic, and money aggregates at once.
Planted on disjoint slices with o_orderkey intact: NULL
o_totalprice / o_orderdate / o_orderstatus / o_orderpriority, NULL
o_custkey (orphaned orders — outer-join and NOT IN stress), zero and
negative and 1e9 totalprices, epoch-1970 and 2099 orderdates,
unknown status codes ('X') and priorities.

    python tools/adversarial_orders_check.py [seed]
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

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    t = pq.read_table(f"{BASE_SF}/orders.parquet")
    pdf = t.to_pandas()
    n = len(pdf)
    idx = list(range(n))
    rng.shuffle(idx)

    def slice_of(a, b):
        return idx[int(n * a) : int(n * b)]

    pdf.loc[slice_of(0.00, 0.02), "o_totalprice"] = None
    pdf.loc[slice_of(0.02, 0.04), "o_orderdate"] = None
    pdf.loc[slice_of(0.04, 0.06), "o_orderstatus"] = None
    pdf.loc[slice_of(0.06, 0.08), "o_orderpriority"] = None
    pdf.loc[slice_of(0.08, 0.10), "o_custkey"] = None
    pdf.loc[slice_of(0.10, 0.11), "o_totalprice"] = 0.0
    pdf.loc[slice_of(0.11, 0.12), "o_totalprice"] = -42.5
    pdf.loc[slice_of(0.12, 0.13), "o_totalprice"] = 1.0e9
    pdf.loc[slice_of(0.13, 0.14), "o_orderdate"] = datetime.datetime(1970, 1, 1)
    pdf.loc[slice_of(0.14, 0.15), "o_orderdate"] = datetime.datetime(2099, 12, 31)
    pdf.loc[slice_of(0.15, 0.16), "o_orderstatus"] = "X"
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=t.schema), f"{tmp}/orders.parquet"
    )
    for f in os.listdir(BASE_SF):
        if f != "orders.parquet":
            dst = os.path.join(tmp, f)
            src = os.path.join(BASE_SF, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def orders_touching_oracled() -> list[str]:
    from parquet_pipeline_spark import registry

    registry.load_all()
    return sorted(
        name for name, sql in registry.ORACLES.items() if "orders" in sql
    )


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_or_")
    build_fixture(tmp, seed)
    names = orders_touching_oracled()
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
