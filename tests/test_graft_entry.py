"""Driver entry-point contract tests (runs on the CPU test backend)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    prob, pred = jax.jit(fn)(*args)
    params, state, image = args
    assert prob.shape == image.shape[:3] + (4,)
    assert pred.shape == image.shape[:3]
    p = np.asarray(prob)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on failure
