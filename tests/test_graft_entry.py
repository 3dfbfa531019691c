"""The driver entry points must compile and run: entry() single-device,
dryrun_multichip() on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax

# the driver dry-runs this entry separately; sharded==single is also covered by test_driver
pytestmark = pytest.mark.slow


def test_entry_jits():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    recon, mu = out
    assert recon.shape == (8, 10, 45)
    assert mu.shape == (8, 2048)
    assert np.isfinite(np.asarray(recon)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
