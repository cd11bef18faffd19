"""Subprocess environment helper: keep test children off the TPU relay.

This environment's axon sitecustomize registers the remote-TPU PJRT
backend in EVERY python process whose env carries PALLAS_AXON_POOL_IPS,
and register() force-sets jax_platforms="axon,cpu" — overriding an env
JAX_PLATFORMS=cpu. A CLI child spawned by a test then initializes the
axon backend and blocks on the (single, shared) relay whenever another
process holds it, which deadlocked the suite (round-4 diagnosis: trivial
CPU jit hangs in a child while the relay is busy). Stripping the pool
var in the child env skips registration entirely and yields a plain CPU
jax. The one test that *wants* the real chip (test_tpu_smoke) builds its
own env and keeps the var.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_env(**extra: str) -> dict:
    """os.environ copy for a CPU-only jax child process."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra)
    return env
