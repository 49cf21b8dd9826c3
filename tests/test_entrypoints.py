"""The driver-facing entry points must work on the virtual CPU mesh."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_signature():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    assert len(args) == 4
    # jittable: trace without executing the full-size program
    traced = jax.make_jaxpr(fn)(*args)
    assert traced is not None
