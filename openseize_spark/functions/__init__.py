from openseize_spark.functions.scalar import (
    edf_decode,
    edf_encode,
    envelope,
    phase_wrapped,
)
