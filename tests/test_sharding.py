"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY §4: 'multi-node without a real cluster')."""

import jax
import numpy as np
import pytest

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


@needs_devices
def test_dryrun_multichip_all_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))


@needs_devices
def test_dryrun_multichip_two_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_entry_compiles_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.bodies.x)
    assert out.bodies.x.shape == args[0].bodies.x.shape
