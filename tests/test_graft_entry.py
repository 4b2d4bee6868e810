"""Regression tests for the driver entry points.

Round-1 failure (VERDICT.md "What's weak" #1): dryrun_multichip raised
`mesh axes product 8 != device count 1` because platform forcing lived only
under __main__ — when the driver imported the module, the environment's
sitecustomize routed JAX to the single real TPU chip. The fix self-forces a
virtual n-device CPU platform inside the function (subprocess re-exec when
the backend is already initialized).
"""

import __graft_entry__ as graft


def test_force_cpu_platform_idempotent():
    # conftest already forced cpu+8 devices; forcing again must succeed
    assert graft._force_cpu_platform(8)


def test_dryrun_multichip_runs():
    # under conftest the inline path is taken (backend already cpu w/ 8 devs)
    graft.dryrun_multichip(8)


def test_entry_compiles_single_device():
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8 and out.ndim == 2
