from openseize_spark.plans.pipeline import Pipeline
