from realtime_spark.operators.cdc import (  # noqa: F401
    SUBSCRIPTION_SCHEMA_DDL,
    expand_wildcards,
    match_changes,
    matched_pairs,
    subscriptions_df,
)
