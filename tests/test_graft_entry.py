"""Guard the driver entry points (__graft_entry__.py).

dryrun_multichip is the scored multi-chip correctness artifact: it must
succeed from ANY host environment (including the axon-pinned default) by
re-exec'ing into a forced-CPU subprocess with the virtual device count
injected before interpreter start.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_subprocess():
    import __graft_entry__ as g
    # Must work regardless of this process's JAX platform; asserts the
    # sharded-vs-single-device loss agreement internally.
    g.dryrun_multichip(8)


def test_dryrun_forces_cpu_even_with_axon_env(monkeypatch):
    """The subprocess env must override the pinned TPU platform."""
    import __graft_entry__ as g
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    # Should still build an 8-device CPU mesh (our flag wins, stale
    # device-count flags are stripped).
    g.dryrun_multichip(8)


def test_entry_signature():
    import __graft_entry__ as g
    fn, args = g.entry()
    assert callable(fn)
    assert len(args) == 3


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
