from neulix_datahub_spark.plans.queries import ORACLES, QUERIES, run_query

__all__ = ["QUERIES", "ORACLES", "run_query"]
