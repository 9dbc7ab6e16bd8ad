"""Multi-chip sharding: the SPMD decode step on a virtual mesh.

Runs the same (dp, sp, tp) shard_map step the driver dry-runs, on the
8-device CPU mesh, and checks the sharded pipeline against the
single-device step (halo exchanges must make sequence-parallel
filtering exact up to the documented comb-history approximation).
"""

import sys

import numpy as np
import pytest


def test_factor_mesh():
    from libnyquist_tpu.parallel.mesh import factor_mesh

    assert factor_mesh(8) == (2, 2, 2)
    assert factor_mesh(4) == (1, 2, 2)
    assert factor_mesh(2) == (1, 1, 2)
    assert factor_mesh(1) == (1, 1, 1)
    for n in (1, 2, 4, 8):
        dp, sp, tp = factor_mesh(n)
        assert dp * sp * tp == n


def test_dryrun_multichip_virtual_mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    pcm = out[0]
    assert np.isfinite(np.asarray(pcm)).all()
