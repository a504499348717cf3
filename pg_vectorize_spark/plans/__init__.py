from pg_vectorize_spark.plans.inspect import PlanReport, plan_report

__all__ = ["PlanReport", "plan_report"]
