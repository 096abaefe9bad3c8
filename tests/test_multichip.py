"""Sharded-vs-single-device equality on the virtual 8-device CPU mesh —
the 'multi-node without a cluster' analogue from SURVEY.md §4."""

import jax
import pytest


def test_dryrun_heat_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from penguin_tpu.parallel.sharding import dryrun_heat_multichip

    dryrun_heat_multichip(8, grid=(31, 31))


def test_graft_entry_singlechip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()


def test_dryrun_stokes_multichip():
    """Sharded Stokes saddle-point apply == single-device apply on the
    8-device virtual mesh."""
    from penguin_tpu.parallel.sharding import dryrun_stokes_multichip

    dryrun_stokes_multichip(8, grid=(31, 31))
