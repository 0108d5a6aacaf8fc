from openseize_spark.operators import (
    blocks,
    fir,
    iir,
    relational,
    resample,
    segmentation,
    spectral,
    stats,
)
