"""Test configuration: force an 8-device virtual CPU platform BEFORE any
backend init so sharding tests exercise real multi-device code paths without
TPU hardware (SURVEY.md section 4, item 5).

Environment quirks this handles (axon TPU tunnel image):
  - sitecustomize pre-imports jax with JAX_PLATFORMS=axon in every python
    process, so the env var is already baked: we must override via
    jax.config.update, not os.environ.
  - Setting JAX_PLATFORMS=cpu in the *shell* environment hangs the axon
    register() at interpreter startup — never do that.
  - XLA_FLAGS is read lazily at backend init, so the virtual device count
    can still be injected here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; this is a no-op)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
