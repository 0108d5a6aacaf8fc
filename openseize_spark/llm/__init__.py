from openseize_spark.llm import dedup, multimodal, similarity, text
