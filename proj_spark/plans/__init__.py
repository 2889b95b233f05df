"""Driver-side pipeline compilation (proj-string -> fused numpy kernel)."""

from proj_spark.plans.pipeline import Pipeline, compile_pipeline  # noqa: F401
