"""Reusable column expressions (all JVM-side, codegen-friendly).

Vector math over ``array<float>`` embedding columns is expressed
with ``zip_with``/``aggregate`` higher-order functions — no Python
UDFs in the hot path, so whole-stage codegen applies and a 100 TB
scan never crosses the JVM↔Python boundary for scoring.

Accumulation is left-to-right over the array on both Spark and the
DuckDB oracle, and everything is computed in DOUBLE, so results
agree to ~1e-15 (we round scores to 6dp at query boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric arrays, in double precision."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a numeric array."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (the reference's score is 1 − cosine
    *distance*, i.e. exactly this — reference:
    chroma_retrieval_util.py:128-129).

    NULL for a zero-norm side: similarity to the zero vector is
    undefined, and under ANSI mode a plain division would abort the
    whole job on the first degenerate row (a real embedding pipeline
    emits them — failed encodes, padded batches). Retrieval
    operators treat the NULL as "not a candidate"."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of a string column (for Jaccard
    similarity / shingling). Pure expression: sequence → transform
    → substring → array_distinct."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


def word_shingles(col: Column | str, n: int = 2) -> Column:
    """Distinct word n-gram shingles (space-joined) — the token-level
    twin of ``char_ngrams`` for Jaccard/MinHash over words instead of
    characters. Documents with fewer than ``n`` tokens yield an empty
    array. Pure expression, no shuffle.

    The token array is LET-BOUND via a one-element-array transform
    before the per-shingle lambda runs. Referencing ``word_tokens``
    directly inside the lambda re-evaluates the whole split+filter
    for every ``F.get`` (Spark does no CSE across lambda scopes) —
    O(words² · n) per document; the sf1 scaling sweep caught it as a
    429 s explode of 4.8 M shingles that takes ~4 s in this form."""

    def shingles_of(arr: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(arr) - n)  # 0-based start offsets
        sh = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.get(arr, i + j) for j in range(n)])
        )
        return F.when(F.size(arr) >= n, F.array_distinct(sh)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(word_tokens(col)), shingles_of), 1)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-element) arrays.

    Union size is computed arithmetically (|A|+|B|−|A∩B|) — exact
    for distinct-element arrays and half the set-building cost of
    ``array_union`` (measured on the d03 verify join, which runs
    this over millions of candidate pairs)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a).cast("double") + F.size(b).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def salted_join(left, right, key: str, salt: int = 16, how: str = "inner"):
    """Skew-mitigating equi-join: the (large, possibly skewed) left
    side gets a per-row salt; the (smaller) right side is exploded
    ``salt`` ways so every (key, salt) bucket can match. A hot key's
    rows then spread over ``salt`` reducers instead of one.

    AQE's skew-join handles most cases automatically (enabled in
    session.py); this is the manual tool for static plans, stable
    shuffles, or engines/paths where AQE can't split (e.g. a skewed
    aggregation feeding a join). Inner/left semantics preserved:
    results equal the plain join (asserted in tests/test_functions.py).
    """
    from pyspark.sql import functions as F

    left_s = left.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    right_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, [key, "_salt"], how).drop("_salt")
