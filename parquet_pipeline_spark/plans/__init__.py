"""NL planning layer (SURVEY §2 A37-A43): pluggable LLM + deterministic fallbacks."""

from parquet_pipeline_spark.plans.client import (  # noqa: F401
    FakeClient,
    LLMClient,
    NullClient,
    OpenAICompatibleClient,
)
from parquet_pipeline_spark.plans.planner import (  # noqa: F401
    decompose_query,
    identify_tables,
    route_intent,
    choose_strategy,
    generate_sql,
)
