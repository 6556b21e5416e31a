"""Text embedding operators (SURVEY §2 A28-A30, A36).

The reference embeds row-chunks with Azure OpenAI in 8 threads ×
batches of 200 (reference: chroma_ingestion_util.py:147-160,
233-254) and embeds the query once on the driver (reference:
chroma_retrieval_util.py:99-109).

Spark-first: embedding is a ``mapInPandas`` stage — Arrow batches in,
one python worker per partition, the embedder called on bounded
text batches (the batch size is the API-call unit, exactly the knob
the reference tunes). The embedder is pluggable
(``Callable[[list[str]], list[list[float]]]``); the default is a
deterministic hash-based embedder so the whole pipeline runs with no
network or keys — the same keyless-first stance as the NL planner.
At 100 TB the parallelism is the number of partitions; no driver
thread pool is needed (that was the reference's single-process
workaround).
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Embedder = Callable[[list[str]], list[list[float]]]


def hash_embedder(dim: int = 64) -> Embedder:
    """Deterministic, network-free embedder: feature j of a text is
    derived from sha256(text, j) scaled to [-1, 1], L2-normalized.
    Similar texts do NOT get similar vectors (it's a stand-in for a
    real model, like the multimodal fake decoder) — but it is stable,
    portable, and exercises identical plumbing."""

    def embed(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            # hex-string chaining + 32-bit scaling keeps every step
            # reproducible in DuckDB SQL (sha256 there is
            # VARCHAR-only and u32 / 2^31 is exact in a double), so
            # e01 carries a full value-hash oracle
            base = hashlib.sha256((t or "").encode("utf-8")).hexdigest()
            vals = []
            for j in range(dim):
                h = hashlib.sha256(f"{base}_{j}".encode("utf-8")).hexdigest()
                vals.append(int(h[:8], 16) / 2**31 - 1.0)
            norm = math.sqrt(sum(v * v for v in vals)) or 1.0
            out.append([v / norm for v in vals])
        return out

    return embed


def default_embedder(dim: int = 64) -> Embedder:
    """Env-driven embedder resolution (keyless-first): a configured
    ``$EMBEDDINGS_BASE_URL`` selects the OpenAI-compatible HTTP
    adapter (reference: chroma_ingestion_util.py:147-160 embeds via
    exactly that endpoint shape); otherwise the deterministic hash
    embedder, so everything runs with no network or keys.

    The HTTP path is wrapped with a dimension check: the remote
    model's dim is fixed server-side and silently ignoring the
    requested ``dim`` would let query/document vector spaces drift
    with the environment — a mismatch raises instead. Registered
    driver-verified ops don't rely on this resolution at all; they
    pass ``hash_embedder`` explicitly so their output shape is
    environment-independent."""
    import os

    if os.environ.get("EMBEDDINGS_BASE_URL"):
        from parquet_pipeline_spark.plans.client import OpenAICompatibleEmbedder

        http = OpenAICompatibleEmbedder()

        def checked(texts: list[str]) -> list[list[float]]:
            vecs = http(texts)
            if vecs and len(vecs[0]) != dim:
                raise ValueError(
                    f"EMBEDDINGS_BASE_URL embedder returned "
                    f"{len(vecs[0])}-dim vectors but dim={dim} was "
                    f"requested; pass dim={len(vecs[0])} (or an "
                    f"explicit embedder) so query and document "
                    f"vectors share one space"
                )
            return vecs

        return checked
    return hash_embedder(dim)


def embed_text(
    df: DataFrame,
    text_col: str,
    id_col: str,
    embedder: Embedder | None = None,
    dim: int = 64,
    batch_size: int = 200,
) -> DataFrame:
    """(id, text) → (id, embedding array<float>). Batched per the
    reference's API-call unit; partition-parallel."""
    embedder = embedder or default_embedder(dim)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                vecs = embedder(list(chunk[text_col].fillna("")))
                yield pd.DataFrame({id_col: chunk[id_col].values, "embedding": vecs})

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def embed_query(question: str, embedder: Embedder | None = None, dim: int = 64) -> list[float]:
    """Driver-side single-string embedding (A30)."""
    embedder = embedder or default_embedder(dim)
    return embedder([question])[0]


def sanitize_collection_name(name: str) -> str:
    """Collection-name rules from the reference (A36,
    chroma_ingestion_util.py:166-186): allowed charset
    ``[a-zA-Z0-9._-]``, length 3-512, must start and end
    alphanumeric."""
    import re

    s = re.sub(r"[^a-zA-Z0-9._-]", "_", str(name))
    s = re.sub(r"^[^a-zA-Z0-9]+", "", s)
    s = re.sub(r"[^a-zA-Z0-9]+$", "", s)
    if len(s) < 3:
        s = (s + "col")[:3] if s else "col"
    return s[:512]


# Driver query for the full A26→A27→A28 ingestion chain with the
# hash embedder. The embedder is passed EXPLICITLY — a configured
# $EMBEDDINGS_BASE_URL must not reroute a driver-verified row shape.
# FULL ORACLE (was rows-only): the embedder spec is hex-chained
# sha256 with exact power-of-two scaling, so DuckDB recomputes every
# component via list comprehensions; the REAL casts mirror the
# float32 storage of the embedding column.
def _register():
    from parquet_pipeline_spark import tables
    from parquet_pipeline_spark.registry import register

    @register(
        "e01_embed_documents",
        oracle="""
        WITH base AS (
          SELECT doc_id, sha256(text) AS b FROM documents WHERE doc_id < 100
        ),
        vals AS (
          SELECT doc_id,
                 [CAST(list_sum([(strpos('0123456789abcdef',
                                         substr(sha256(b || '_' || j), i, 1)) - 1)
                                  * 16 ** (8 - i) FOR i IN range(1, 9)]) AS DOUBLE)
                  / 2147483648.0 - 1.0
                  FOR j IN range(0, 16)] AS v
          FROM base
        ),
        n AS (
          SELECT doc_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM vals
        ),
        f32 AS (
          SELECT doc_id,
                 [CAST(CAST(x / nrm AS REAL) AS DOUBLE) FOR x IN v] AS e
          FROM n
        )
        SELECT doc_id,
               ROUND(e[1], 6) AS e0,
               ROUND(sqrt(list_sum([x * x FOR x IN e])), 3) AS norm
        FROM f32
        """,
    )
    def e01_embed_documents(spark, sf_dir: str) -> DataFrame:
        docs = tables.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 100
        )
        emb = embed_text(docs, "text", "doc_id", embedder=hash_embedder(16), dim=16)
        # project to a stable, hash-friendly shape: id + first
        # component + norm (floats are deterministic per text)
        first = F.round(F.element_at("embedding", 1).cast("double"), 6)
        norm = F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            3,
        )
        return emb.select("doc_id", first.alias("e0"), norm.alias("norm"))


_register()
