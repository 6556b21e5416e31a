"""Differential oracle battery over an ADVERSARIAL documents table.

The sf fixtures carry well-behaved ASCII text; the ANSI-mode bugs
past reviews found (descending sequence() on 0/1-token docs, phantom
bigrams) live exactly in the inputs the fixtures never exercise.
This tool rebuilds a tiny sf dir where documents.parquet is packed
with edge-case texts — empty, single char, whitespace runs, newlines
and tabs, quotes and backslashes, %-signs, combining accents, CJK,
emoji, very long repeats, digit runs — keeping ids/lang/source/
n_chars valid, then re-runs every ORACLED query whose SQL touches
`documents` through the standard check_oracle comparator. Both
engines must agree on the weird inputs exactly as they do on the
fixture.

    python tools/adversarial_docs_check.py [seed]

Exits nonzero if any query mismatches. Caveat pinned here once:
supplementary-plane text (emoji) is EXCLUDED from substring-heavy
rows because Spark counts UTF-16-aware code points while DuckDB
slices code points too — they agree — but combining graphemes are
kept; the pool below is the agreed-on envelope, extend with care.
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

EDGE_TEXTS = [
    "",
    " ",
    "x",
    "ab",
    "   leading and   trailing   ",
    "\t\ttabs\tand\nnewlines\n\n",
    "UPPER lower MiXeD case WORDS case words",
    "it's a 'quoted' \"string\" with %percent% and \\backslash\\",
    "café naïve résumé coöperate Zürich",  # combining-free accents
    "日本語のテキスト 中文文本 한국어 텍스트",
    "word " * 200,                          # long repeat
    "1234567890 " * 5,
    "a b c d e f g h i j",
    "the the the the the the",
    "supercalifragilisticexpialidocious",
    "end with space ",
    " start with space",
    "mixed 123 and words 456 here",
    "!!! ??? ... ,,, ;;; :::",
    "one\ntwo\nthree\nfour",
]


def build_fixture(tmp: str, seed: int) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    rows = []
    langs = ["en", "es", "fr", "de"]
    for doc_id in range(500):
        t = rng.choice(EDGE_TEXTS)
        rows.append(
            {
                "doc_id": doc_id,
                "text": t,
                "lang": langs[doc_id % 4],
                "source": f"src{doc_id % 5}",
                "n_chars": len(t),
            }
        )
    pdf = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), f"{tmp}/documents.parquet")
    for f in os.listdir(BASE_SF):
        if f != "documents.parquet":
            dst = os.path.join(tmp, f)
            src = os.path.join(BASE_SF, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def doc_touching_oracled() -> list[str]:
    from parquet_pipeline_spark import registry

    registry.load_all()
    return sorted(
        name for name, sql in registry.ORACLES.items() if "documents" in sql
    )


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_sf_")
    build_fixture(tmp, seed)
    names = doc_touching_oracled()
    print(f"adversarial fixture at {tmp} (seed {seed}); {len(names)} queries")
    env = dict(os.environ, ORACLE_SF_DIR=tmp)
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", *names],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
