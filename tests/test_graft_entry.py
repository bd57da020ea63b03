"""Guard the driver contract: the multichip dry run must always compile and
execute on the virtual device mesh (the driver invokes it the same way)."""

import jax


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


def test_dryrun_single_device():
    import __graft_entry__ as g

    g.dryrun_multichip(1)
