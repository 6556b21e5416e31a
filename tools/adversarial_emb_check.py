"""Differential oracle battery over an ADVERSARIAL embeddings table.

Vector twin of adversarial_docs_check.py: rebuilds the sf dir with
an embeddings.parquet packed with the cases real embedding pipelines
emit but the fixtures never do — exact duplicate vectors, near-
duplicates at 1e-6, the all-zeros vector (zero norm → NaN cosine),
tiny (1e-20) and huge (1e20) magnitudes, one-hot axes, sign flips —
then re-runs every ORACLED query whose SQL touches `embeddings`
through the standard comparator. Spark and DuckDB must keep agreeing
(both engines produce NaN→NULL for the zero vector and IEEE-sort it
the same way; that agreement is exactly what this pins).

NaN/Inf COMPONENTS are deliberately excluded: cross-engine ordering
of NaN *inputs* is not a contract either engine documents for array
similarity, so our operators' contract is "finite components only"
(upstream validation's job — quality.py rules can enforce it).

    python tools/adversarial_emb_check.py [seed]
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
DIM = 64


def build_fixture(tmp: str, seed: int) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)

    def rand_vec():
        return [rng.gauss(0, 1) for _ in range(DIM)]

    rows = []
    base = {}
    for vec_id in range(500):
        kind = vec_id % 10
        if vec_id < 16:
            # ids 0..15 stay ordinary: query pins (vec_id 0/… < 5) and
            # even-spaced centroid seeds must hit well-behaved vectors
            v = rand_vec()
        elif kind == 3 and vec_id - 10 in base:
            v = list(base[vec_id - 10])               # exact duplicate
        elif kind == 4 and vec_id - 10 in base:
            v = [x + 1e-6 for x in base[vec_id - 10]]  # near-duplicate
        elif kind == 5:
            v = [0.0] * DIM                            # zero norm
        elif kind == 6:
            v = [x * 1e-20 for x in rand_vec()]        # tiny magnitude
        elif kind == 7:
            v = [x * 1e20 for x in rand_vec()]         # huge magnitude
        elif kind == 8:
            v = [0.0] * DIM
            v[vec_id % DIM] = 1.0                      # one-hot
        elif kind == 9:
            v = [-x for x in rand_vec()]               # sign-heavy
        else:
            v = rand_vec()
        base[vec_id] = v
        rows.append(
            {
                "vec_id": vec_id,
                "embedding": [float(f"{x:.6g}") for x in v],
                "label": vec_id % 7,
            }
        )
    pdf = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema), f"{tmp}/embeddings.parquet"
    )
    for f in os.listdir(BASE_SF):
        if f != "embeddings.parquet":
            dst = os.path.join(tmp, f)
            src = os.path.join(BASE_SF, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)


def emb_touching_oracled() -> list[str]:
    from parquet_pipeline_spark import registry

    registry.load_all()
    return sorted(
        name for name, sql in registry.ORACLES.items() if "embeddings" in sql
    )


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    tmp = tempfile.mkdtemp(prefix="adversarial_emb_")
    build_fixture(tmp, seed)
    names = emb_touching_oracled()
    print(f"adversarial fixture at {tmp} (seed {seed}); {len(names)} queries")
    # sig-digit compare: with planted 1e20-magnitude components,
    # fixed-6dp strings flip on last-ulp accumulation-order
    # differences (same class as sf1 money sums — comparator
    # artifact, not an operator bug)
    env = dict(os.environ, ORACLE_SF_DIR=tmp, ORACLE_SIG_DIGITS="9")
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", *names],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
