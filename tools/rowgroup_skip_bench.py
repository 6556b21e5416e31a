"""Row-group skipping proof for write_sorted (BENCH_NOTES.md).

Writes lineitem twice — hash-scattered vs range-sorted on l_shipdate
(write_sorted) — with small row groups, then for a selective range
predicate counts, from parquet min/max statistics, how many row
groups a reader must touch in each layout, and times the filtered
Spark scan on both.

Usage: python tools/rowgroup_skip_bench.py [sf_dir]
"""

import os
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from parquet_pipeline_spark.sources.writers import write_parquet, write_sorted

LO, HI = "1995-06-01", "1995-06-30"


def touched_row_groups(path: str, col: str, lo, hi):
    touched = total = rows_touched = rows_total = 0
    for entry in sorted(os.scandir(path), key=lambda e: e.name):
        if not entry.name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(entry.path)
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            st = meta.column(idx).statistics
            total += 1
            rows_total += meta.num_rows
            if st is None or (str(st.min) <= hi and str(st.max) >= lo):
                touched += 1
                rows_touched += meta.num_rows
    return touched, total, rows_touched, rows_total


def timed_count(spark, path):
    df = spark.read.parquet(path).filter(
        (F.col("l_shipdate") >= LO) & (F.col("l_shipdate") <= HI)
    )
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    with tempfile.TemporaryDirectory() as tmp:
        unsorted_path = os.path.join(tmp, "li_unsorted")
        sorted_path = os.path.join(tmp, "li_sorted")
        # hash-scatter first so the incoming order carries no luck
        write_parquet(
            li.repartition(8), unsorted_path, row_group_bytes=1 * 1024 * 1024
        )
        write_sorted(
            li, sorted_path, ["l_shipdate"], num_files=8,
            row_group_bytes=1 * 1024 * 1024,
        )

        for name, path in (("unsorted", unsorted_path), ("sorted", sorted_path)):
            t, tot, rt, rtot = touched_row_groups(path, "l_shipdate", LO, HI)
            n, secs = timed_count(spark, path)
            print(
                f"{name:9s} row-groups touched {t}/{tot} "
                f"({100*t/tot:.0f}%), rows touched {rt}/{rtot} "
                f"({100*rt/rtot:.0f}%), filtered count={n} in {secs:.2f}s"
            )


if __name__ == "__main__" and not os.environ.get("ZORDER_BENCH"):
    main()


def zorder_vs_sorted(sf_dir: str) -> None:
    """Two-dimensional pruning comparison: orders clustered by
    (o_custkey, o_totalprice) via Z-order vs 1-D sorted on
    o_custkey alone; count row groups a min/max reader must touch
    for a predicate on EACH dimension."""
    from parquet_pipeline_spark.sources.writers import write_sorted, write_zordered
    from parquet_pipeline_spark.session import get_spark

    spark = get_spark("zorder-bench")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = tempfile.mkdtemp(prefix="zorder-bench-")
    zdest, sdest = f"{base}/zorder.parquet", f"{base}/sorted.parquet"
    write_zordered(orders, zdest, ["o_custkey", "o_totalprice"], num_files=32)
    write_sorted(orders, sdest, ["o_custkey"], num_files=32)

    lo_ck, hi_ck = 100, 140          # selective custkey band
    lo_tp, hi_tp = 50000.0, 80000.0  # selective totalprice band
    for name, dest in (("sorted_1d", sdest), ("zorder", zdest)):
        for col, lo, hi in (
            ("o_custkey", lo_ck, hi_ck),
            ("o_totalprice", lo_tp, hi_tp),
        ):
            touched = total = 0
            for entry in sorted(os.scandir(dest), key=lambda e: e.name):
                if not entry.name.endswith(".parquet"):
                    continue
                pf = pq.ParquetFile(entry.path)
                idx = pf.schema_arrow.get_field_index(col)
                for rg in range(pf.metadata.num_row_groups):
                    st = pf.metadata.row_group(rg).column(idx).statistics
                    total += 1
                    if st is None or (float(st.min) <= hi and float(st.max) >= lo):
                        touched += 1
            print(f"{name:10s} predicate on {col:13s}: touches {touched}/{total} row groups")


if __name__ == "__main__" and os.environ.get("ZORDER_BENCH"):
    zorder_vs_sorted(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    )
    raise SystemExit(0)
