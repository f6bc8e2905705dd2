"""Worker process for the multi-host (multi-process) tests.

Launched by tests/test_multihost.py as `python tests/mh_worker.py <cli args>`
with the NSHMC_DIST / NSHMC_COORDINATOR / NSHMC_NUM_PROCESSES /
NSHMC_PROCESS_ID environment contract set by the parent. Forces a 2-device
virtual CPU platform per process so a 2-process launch yields a 4-device
global mesh (cross-process collectives ride gloo on CPU, the stand-in for
ICI/DCN on real pods — SURVEY.md section 5 distributed backend).

Platform selection follows the conftest.py quirk notes: JAX_PLATFORMS=cpu
must be applied via jax.config.update (the axon plugin hangs if set in the
shell environment), and XLA_FLAGS is read lazily so the virtual device
count can be injected here before backend init.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nshmc_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
    # one line the parent test greps to confirm this rank finished cleanly
    print(f"MH_WORKER_DONE rank={os.environ.get('NSHMC_PROCESS_ID')}",
          flush=True)
