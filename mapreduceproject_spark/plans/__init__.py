from mapreduceproject_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    oracle_sql,
    queries,
    query,
)

# Importing these modules populates the registry.
from mapreduceproject_spark.plans import (  # noqa: F401,E402
    mapreduce_queries,
    relational,
    tpch_deep,
    dedup_queries,
    similarity_queries,
    text_queries,
    curation_queries,
    multimodal_queries,
    streaming_queries,
    governance_queries,
    observability_queries,
    stats_queries,
    analytics_queries,
    pretrain_queries,
    layout_queries,
)
