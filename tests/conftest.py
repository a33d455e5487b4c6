"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (no TPU pod in CI);
the driver's dryrun_multichip does the same. Real-chip benchmarks live in
bench.py, not here.

The container's sitecustomize registers the remote `axon` TPU PJRT plugin
and pins jax_platforms to it; initializing that backend dials a tunnel and
can block for minutes. Tests must never touch it, so we force the platform
back to cpu AND drop the plugin's backend factory before any JAX op runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax._src.xla_bridge as _xb  # noqa: E402

for _name in [k for k in list(_xb._backend_factories) if k != "cpu"]:
    _xb._backend_factories.pop(_name)
