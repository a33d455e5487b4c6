"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (no TPU pod in CI);
the driver's dryrun_multichip does the same. Real-chip benchmarks live in
bench.py, not here.

The container's sitecustomize registers the remote `axon` TPU PJRT plugin
and pins jax_platforms to it (overriding the JAX_PLATFORMS env var);
initializing that backend dials a tunnel and can block for minutes. An
explicit config update after import wins and keeps tests on CPU. Do NOT
remove the plugin's backend factory instead — that also unregisters the
'tpu' MLIR platform and breaks jax.experimental.checkify (optax) imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compilation cache: the lane's cost is dominated by
# recompiling the same programs every run (AOT blobs are host-specific,
# hence the cpuinfo tag — a foreign cache would SIGILL). A warm cache
# takes the not-slow lane from ~10+ min to well under the 5-min budget.


def _cache_tag() -> str:
    import hashlib
    import platform

    try:
        info = open("/proc/cpuinfo").read()
        fl = next((l for l in info.splitlines() if l.startswith("flags")), "")
    except OSError:
        fl = platform.processor()
    return hashlib.sha1(fl.encode()).hexdigest()[:10]


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 f".jax_cache-cpu-{_cache_tag()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
