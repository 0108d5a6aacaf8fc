from openseize_spark.streaming import windows
