"""The latent-space optimization runtime."""

from globalegomocap_tpu.optimize.lbfgs import lbfgs_minimize, adam_minimize
from globalegomocap_tpu.optimize.window import (
    slice_windows, merge_windows, num_windows)
