"""Data IO: the test_data.pkl contract, AMASS training data, HDF5 packing
and synthetic fixtures."""

from globalegomocap_tpu.data.test_data import TestChunk, load_test_chunk
from globalegomocap_tpu.data.synthetic import synthetic_chunk, synthetic_amass
