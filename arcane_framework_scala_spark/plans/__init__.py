from arcane_framework_scala_spark.plans.audit import PlanAudit, audit_plan

__all__ = ["PlanAudit", "audit_plan"]
