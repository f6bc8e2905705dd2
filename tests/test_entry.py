"""Driver-hook validation: __graft_entry__.dryrun_multichip must build an
n-device ('chain',) mesh and execute one full sharded HMC step (tiny shapes)
— mirrors how the driver dry-run-compiles the multi-chip path."""
import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2(monkeypatch):
    # keep the default-suite variant fast; the driver artifact and the
    # slow-marked 8-device test exercise the default 64^2 shape
    monkeypatch.setenv("NSHMC_DRYRUN_SIZE", "32")
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_entry_signature_tiny():
    """entry() contract: returns (fn, args) with fn jittable. Exercised on
    the tiny flagship config to keep CPU test time bounded; the driver
    compile-checks the full 256^2 config on real hardware."""
    import __graft_entry__ as ge

    model, params, cfg = ge._flagship(tiny=True)
    d = cfg.image_size
    import jax.numpy as jnp

    fn = jax.jit(lambda p, x, t: model.apply(p, x, t))
    out = fn(params, jnp.ones((1, d, d, 3), jnp.float32),
             jnp.full((1,), 5.0, jnp.float32))
    assert out.shape == (1, d, d, cfg.out_channels)
    assert out.dtype == jnp.float32
