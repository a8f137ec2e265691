from pigpen_spark.plans.viz import explain_str, show, plan_dot

__all__ = ["explain_str", "show", "plan_dot"]
