"""Differential oracle battery over a DIRTY events table.

Fourth adversarial fixture (docs, embeddings, lineitem, now the
event stream): real clickstreams carry NULL timestamps, NULL actors,
malformed JSON props, simultaneous events (tie-break stress), and
absurd values. Planted on disjoint slices with event_id intact:
NULL ts / user_id / event_type / value, props in {'not json', '',
'{}', nested, wrong-typed}, duplicated (user_id, ts) pairs, negative
and 1e12 values, epoch-1970 and 2099 timestamps. Every ORACLED query
whose SQL touches `events` then re-runs through the standard
comparator — null ordering inside windows, JSON error handling, and
as-of/sessionize tie-breaks must agree cross-engine.

    python tools/adversarial_events_check.py [seed]
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
    t = pq.read_table(f"{BASE_SF}/events.parquet")
    pdf = t.to_pandas()
    n = len(pdf)
    idx = list(range(n))
    rng.shuffle(idx)

    def slice_of(a, b):
        return idx[int(n * a) : int(n * b)]

    pdf.loc[slice_of(0.00, 0.02), "ts"] = None
    pdf.loc[slice_of(0.02, 0.04), "user_id"] = None
    pdf.loc[slice_of(0.04, 0.06), "event_type"] = None
    pdf.loc[slice_of(0.06, 0.08), "value"] = None
    pdf.loc[slice_of(0.08, 0.09), "props"] = "not json"
    pdf.loc[slice_of(0.09, 0.10), "props"] = ""
    pdf.loc[slice_of(0.10, 0.11), "props"] = "{}"
    pdf.loc[slice_of(0.11, 0.12), "props"] = '{"k": "str"}'
    pdf.loc[slice_of(0.12, 0.13), "props"] = None
    pdf.loc[slice_of(0.13, 0.14), "value"] = -1.0
    pdf.loc[slice_of(0.14, 0.15), "value"] = 1.0e12
    pdf.loc[slice_of(0.15, 0.16), "ts"] = datetime.datetime(1970, 1, 1)
    pdf.loc[slice_of(0.16, 0.17), "ts"] = datetime.datetime(2099, 12, 31)
    # simultaneous events: copy another row's ts within the same user
    dup = slice_of(0.17, 0.19)
    for i in dup:
        j = idx[(idx.index(i) + 1) % n] if False else rng.randrange(n)
        pdf.loc[i, "ts"] = pdf.loc[j, "ts"]
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=t.schema), f"{tmp}/events.parquet"
    )
    for f in os.listdir(BASE_SF):
        if f != "events.parquet":
            dst = os.path.join(tmp, f)
            src = os.path.join(BASE_SF, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def events_touching_oracled() -> list[str]:
    from parquet_pipeline_spark import registry

    registry.load_all()
    return sorted(
        name for name, sql in registry.ORACLES.items() if "events" in sql
    )


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_ev_")
    build_fixture(tmp, seed)
    names = events_touching_oracled()
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
