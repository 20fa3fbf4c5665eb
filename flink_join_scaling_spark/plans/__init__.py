from flink_join_scaling_spark.plans.registry import QUERIES, oracle_sqls, query_fns  # noqa: F401

# importing the modules populates the registry
from flink_join_scaling_spark.plans import reference_joins  # noqa: F401,E402
from flink_join_scaling_spark.plans import relational  # noqa: F401,E402
from flink_join_scaling_spark.plans import streaming_q  # noqa: F401,E402
from flink_join_scaling_spark.plans import llmdata  # noqa: F401,E402
