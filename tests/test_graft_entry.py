"""Driver entry points: multi-chip dry run on the fake 8-device CPU mesh."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
