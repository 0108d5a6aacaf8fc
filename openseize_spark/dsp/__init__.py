from openseize_spark.dsp import design, kernels
