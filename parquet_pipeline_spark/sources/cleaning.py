"""Column-name normalization (SURVEY §2 A15).

The reference has two divergent variants: variant A maps punctuation
to *space* before collapsing whitespace (reference:
duckdb_util.py:29-61), variant B maps punctuation straight to ``_``
(reference: ingestion_pipeline_langgraph.py:71-89, tester.py:21-35),
so ``Col.A`` → ``col_a`` (A) vs ``col__a`` (B). We take variant A's
output shape as canonical (single underscores, no doubled runs) but
keep both rule-sets explicit, and always dedup collisions with
``_1``, ``_2``… numeric suffixes like both variants do.
"""

from __future__ import annotations

import re


def _normalize(name: str, punctuation_to: str) -> str:
    s = str(name).strip().lower()
    s = re.sub(r"[^\w\s]", punctuation_to, s)
    s = re.sub(r"\s+", "_", s.strip())
    s = re.sub(r"_+", "_", s).strip("_")
    return s or "col"


def clean_column_names(names: list[str], variant: str = "a") -> list[str]:
    """Normalize raw header names to lower_snake_case and dedup
    collisions with numeric suffixes.

    >>> clean_column_names([" Relative humidity.", "Col A", "Col.A"])
    ['relative_humidity', 'col_a', 'col_a_1']
    """
    punct = " " if variant == "a" else "_"
    seen: dict[str, int] = {}
    out: list[str] = []
    for raw in names:
        base = _normalize(raw, punct)
        if base in seen:
            seen[base] += 1
            candidate = f"{base}_{seen[base]}"
            while candidate in seen:
                seen[base] += 1
                candidate = f"{base}_{seen[base]}"
            seen[candidate] = 0
            out.append(candidate)
        else:
            seen[base] = 0
            out.append(base)
    return out


def clean_columns(df, variant: str = "a"):
    """Apply clean_column_names to a Spark DataFrame (pure rename —
    a Project node, no data movement)."""
    return df.toDF(*clean_column_names(df.columns, variant=variant))
