"""Regression guard for the driver entry points: the multi-chip dry run must
compile + execute a full dp/tp-sharded training step on the virtual CPU mesh."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8_devices():
    import jax

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
