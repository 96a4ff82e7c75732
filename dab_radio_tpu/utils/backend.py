"""JAX backend selection for the CLI apps.

The deployment image may pin JAX_PLATFORMS to an accelerator relay via
sitecustomize before app code runs, so an environment variable cannot force
CPU. These helpers give every app a --backend flag that applies
jax.config.update("jax_platforms", ...) before the first backend
initialization (reference analog: the apps' thread-count/arch flags,
examples/basic_radio_app.cpp:82-106 — pick the execution substrate at the
CLI).
"""

import argparse


def add_backend_flag(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--backend", default="default",
        choices=["default", "cpu", "tpu"],
        help="JAX platform override (default: whatever the environment "
             "registered)")


def apply_backend(args: argparse.Namespace) -> None:
    """Must be called before any jax computation in the app."""
    backend = getattr(args, "backend", "default")
    if backend == "default":
        return
    import jax
    jax.config.update("jax_platforms", backend)
