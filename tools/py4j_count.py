"""Count py4j round-trips per query plan build (r16 round 2).

Wall-clock on this shared box swings 2-50x under neighbor bursts
(hrtimer stalls in dmesg), so driver-latency wins are recorded here
as a NOISE-IMMUNE structural metric: the number of py4j commands the
gateway sends while the registry builder constructs the DataFrame.
Each command is one synchronous JVM round-trip (~1-4 ms on this box
under load); plan-build latency is ~linear in the count.

Usage:
    python tools/py4j_count.py [query_name ...]   # default: HEADLINE

Output: one line per query: name, py4j command count during build.
Build only — no action is run, so the count is deterministic for a
given code version (modulo one-time session/table-memo warmup, which
a throwaway first build of each query absorbs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parquet_pipeline_spark import registry
    from parquet_pipeline_spark.session import get_spark, warm_up

    registry.load_all()
    spark = get_spark("py4j_count")
    warm_up(spark)

    import bench
    from py4j.clientserver import ClientServerConnection
    from py4j.java_gateway import GatewayConnection

    counter = {"n": 0}
    patched = []
    for cls in (ClientServerConnection, GatewayConnection):
        orig = cls.send_command

        def wrapper(self, *a, _orig=orig, **kw):
            counter["n"] += 1
            return _orig(self, *a, **kw)

        cls.send_command = wrapper
        patched.append((cls, orig))

    names = sys.argv[1:] or bench.HEADLINE
    try:
        for name in names:
            fn = registry.QUERIES.get(name)
            if fn is None:
                print(f"{name}\tSKIP (not registered)")
                continue
            fn(spark, sf_dir)  # warm memos/first-parse caches
            counter["n"] = 0
            fn(spark, sf_dir)
            print(f"{name}\t{counter['n']}")
    finally:
        for cls, orig in patched:
            cls.send_command = orig


if __name__ == "__main__":
    main()
