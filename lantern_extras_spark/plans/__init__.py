from lantern_extras_spark.plans.inspect import (  # noqa: F401
    plan_summary,
    assert_filter_pushed,
    assert_column_pruned,
    assert_broadcast_join,
    count_shuffles,
)
