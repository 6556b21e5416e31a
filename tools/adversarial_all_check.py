"""Capstone adversarial battery: EVERY dirty fixture at once.

The six per-table batteries prove each contract in isolation; this
one composes them — documents, embeddings, lineitem, events, orders,
AND the dimension tables (customer/supplier/part, r8) all rebuilt
with their planted dirt in a single sf dir — and re-runs the ENTIRE
oracled registry. Queries that join two dirty
tables (orphaned orders against dirty lineitem, dirty events against
dirty docs contexts) exercise contract COMBINATIONS no single-table
battery reaches.

    python tools/adversarial_all_check.py [seed]

Sig-digit compare (the planted 1e9/1e20 magnitudes).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.001"


def main() -> int:
    import shutil

    import adversarial_dims_check as dims
    import adversarial_docs_check as docs
    import adversarial_emb_check as emb
    import adversarial_events_check as events
    import adversarial_lineitem_check as lineitem
    import adversarial_orders_check as orders

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_all_")
    # each build_fixture writes its dirty table + copies the rest from
    # BASE_SF; run them into staging dirs and assemble the union
    staging = {}
    for name, mod in (
        ("documents", docs),
        ("embeddings", emb),
        ("lineitem", lineitem),
        ("events", events),
        ("orders", orders),
    ):
        d = tempfile.mkdtemp(prefix=f"adv_stage_{name}_")
        mod.build_fixture(d, seed)
        staging[name] = d
    # the dims battery dirties three tables in one fixture dir
    d = tempfile.mkdtemp(prefix="adv_stage_dims_")
    dims.build_fixture(d, seed)
    for t in ("customer", "supplier", "part"):
        staging[t] = d
    for f in os.listdir(BASE_SF):
        table = f.replace(".parquet", "")
        src_dir = staging.get(table, BASE_SF)
        src = os.path.join(src_dir, f)
        dst = os.path.join(tmp, f)
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)

    from parquet_pipeline_spark import registry

    registry.load_all()
    names = sorted(registry.ORACLES)
    print(f"all-dirty fixture at {tmp} (seed {seed}); {len(names)} oracled queries")
    env = dict(os.environ, ORACLE_SF_DIR=tmp, ORACLE_SIG_DIGITS="9")
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", *names],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc.returncode


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
