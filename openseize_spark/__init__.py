"""openseize_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mscaudill/openseize (EEG-scale DSP), rebuilt
Spark-first.

The reference (see /root/reference, SURVEY.md) is a pure-Python iterative DSP
library whose single abstraction is the lazy chunked "producer"
(reference: core/producer.py:146-210).  Here the equivalent abstraction is a
long-format Spark DataFrame ``(recording_id, channel, t, v)`` — lazy,
partitioned, schema-checked by Catalyst — plus driver-side filter *design*
(numpy) parameterizing distributed *application* kernels.

Modules
-------
session       tuned SparkSession factory
signal        SignalFrame wrapper + deterministic signal builders
operators     relational core, stats, segmentation, spectral, FIR/IIR, resample
dsp           pure-numpy kernels + filter design (driver-side, no scipy)
llm           LLM-data-pipeline ops: dedup, text stats, similarity search
sources       loaders for the driver test tables; EDF-style source scaffolding
plans         Pipeline (transform-chaining), mirrors reference tools/pipeline.py
streaming     structured-streaming analogs of the sliding-window estimators
"""

from openseize_spark.session import get_spark
from openseize_spark.signal import SignalFrame, signal_from_lineitem

__version__ = "0.1.0"

__all__ = ["get_spark", "SignalFrame", "signal_from_lineitem", "__version__"]
