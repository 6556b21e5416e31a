"""Capture .explain('formatted') for queries into plans/r17/.

Usage:
    python tools/r17_plans.py before [names...]   # -> plans/r17/<q>_before.txt
    python tools/r17_plans.py after  [names...]   # -> plans/r17/<q>_after.txt

Default names: the bench HEADLINE set. Uses sf0.1 (the bench scale)
so the plan AQE sees matches what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), "first arg must be before|after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parquet_pipeline_spark import registry
    from parquet_pipeline_spark.session import get_spark, warm_up

    registry.load_all()
    spark = get_spark("r17_plans")
    warm_up(spark)

    import bench

    names = sys.argv[2:] or bench.HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
