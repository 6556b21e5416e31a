"""Differential oracle battery over DIRTY dimension tables
(customer + supplier + part — the sixth adversarial fixture, r8).

The five r7 batteries dirty the fact/content tables; this one
stresses the DIMENSION side that broadcast joins, group-bys, and
rank windows hang off: NULL group keys (c_mktsegment, p_brand,
p_type), NULL join keys (c_nationkey, s_nationkey — orphaned
dimension rows), NULL/negative/zero money and size columns
(c_acctbal, s_acctbal, p_retailprice, p_size — the r7 lesson class:
windows ordered by a now-nullable key diverge unless NULLS
FIRST/LAST is pinned), NULL and unicode names (string fns, LIKE,
ORDER BY ties). All three tables are dirtied in ONE fixture so
cross-dimension queries see composed dirt.

    python tools/adversarial_dims_check.py [seed]
"""

from __future__ import annotations

import os
import re
import random
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.001"


def _dirty(pdf, rng, plan):
    n = len(pdf)
    idx = list(range(n))
    rng.shuffle(idx)

    def slice_of(a, b):
        return idx[int(n * a) : int(n * b)]

    a = 0.0
    for col, value, width in plan:
        pdf.loc[slice_of(a, a + width), col] = value
        a += width
    return pdf


def build_fixture(tmp: str, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    plans = {
        "customer": [
            ("c_mktsegment", None, 0.03),   # NULL group key
            ("c_acctbal", None, 0.03),      # NULL order/agg key
            ("c_acctbal", -999.99, 0.02),
            ("c_acctbal", 0.0, 0.02),
            ("c_nationkey", None, 0.03),    # orphaned dim row
            ("c_name", None, 0.02),
            ("c_name", "Ünïcodé–Cüstomer™ 'quote'", 0.02),
        ],
        "supplier": [
            ("s_nationkey", None, 0.04),
            ("s_acctbal", None, 0.04),
            ("s_acctbal", -1.0e6, 0.02),
            ("s_name", None, 0.02),
            ("s_name", "Sûpplïer—#2 \"dq\"", 0.02),
        ],
        "part": [
            ("p_brand", None, 0.03),
            ("p_type", None, 0.03),
            ("p_retailprice", None, 0.03),
            ("p_retailprice", 0.0, 0.02),
            ("p_retailprice", -5.0, 0.02),
            ("p_size", None, 0.03),
            ("p_name", "pärt∞ (weird)", 0.02),
        ],
    }
    for table, plan in plans.items():
        t = pq.read_table(f"{BASE_SF}/{table}.parquet")
        pdf = _dirty(t.to_pandas(), rng, plan)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema), f"{tmp}/{table}.parquet"
        )
    for f in os.listdir(BASE_SF):
        if f not in ("customer.parquet", "supplier.parquet", "part.parquet"):
            dst = os.path.join(tmp, f)
            src = os.path.join(BASE_SF, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def dim_touching_oracled() -> list[str]:
    from parquet_pipeline_spark import registry

    registry.load_all()
    # word-boundary match (ADVICE r8): substring probes silently
    # dropped oracles that reference e.g. `part,` / `part)` / a
    # trailing `FROM part`, quietly shrinking battery coverage
    pat = re.compile(r"\b(customer|supplier|part)\b", re.IGNORECASE)
    return sorted(
        name for name, sql in registry.ORACLES.items() if pat.search(sql)
    )


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_dim_")
    build_fixture(tmp, seed)
    names = dim_touching_oracled()
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
