from cdc_lite_spark.plans.inspect import explain_str, physical_plan_checks

__all__ = ["explain_str", "physical_plan_checks"]
