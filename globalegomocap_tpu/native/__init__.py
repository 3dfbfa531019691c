"""Native (C) host-side kernels for the serving runtime.

The TPU compute path is jax/XLA/Pallas; these kernels cover the HOST
side of the serving pipeline, where the single CPU core is the
producer's budget.  Currently: the ingest peak-crop pass
(`hostcrop`), used by `SequenceOptimizer.stage(on_host=True)`.
"""

from globalegomocap_tpu.native.hostcrop import (  # noqa: F401
    crop_peak_native, native_available)
