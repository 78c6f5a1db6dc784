"""Shared script plumbing: backend selection.

The bench/experiment hot paths are jitted and TPU-friendly, but utility
scripts do eager geometry, which is slow over a remote-tunnelled TPU —
``--cpu`` forces the host backend (must run before heavy jax use).
"""

import os
import sys


def setup_backend(argv=None):
    """Consume a --cpu flag (if present) and force the CPU platform."""
    argv = sys.argv if argv is None else argv
    if "--cpu" in argv:
        argv.remove("--cpu")
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
