"""Driver entry-point plumbing.

``dryrun_multichip`` must never initialise the host's real backend just to
count devices — on a remote-TPU (tunnelled) host that init blocks outright
when the tunnel is unreachable, and the virtual-CPU subprocess is the
correct path regardless.  The decision is therefore env-only
(_env_has_virtual_cpu_devices); these tests pin that contract.  The full
subprocess dryrun itself is exercised by the driver (and is too heavy for
the unit suite).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _env_has_virtual_cpu_devices  # noqa: E402


def _with_env(monkeypatch, platforms, xla_flags):
    if platforms is None:
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    else:
        monkeypatch.setenv("JAX_PLATFORMS", platforms)
    if xla_flags is None:
        monkeypatch.delenv("XLA_FLAGS", raising=False)
    else:
        monkeypatch.setenv("XLA_FLAGS", xla_flags)


def test_virtual_cpu_env_detected(monkeypatch):
    _with_env(monkeypatch, "cpu",
              "--xla_force_host_platform_device_count=8")
    assert _env_has_virtual_cpu_devices(8)
    assert _env_has_virtual_cpu_devices(4)      # more than enough
    assert not _env_has_virtual_cpu_devices(16)  # too few


def test_tunnel_env_forces_subprocess(monkeypatch):
    # the bench host: platform pinned to the remote tunnel — must NOT try
    # to count devices in-process (that init hangs when the tunnel is down)
    _with_env(monkeypatch, "axon",
              "--xla_force_host_platform_device_count=8")
    assert not _env_has_virtual_cpu_devices(8)


def test_no_forced_count_forces_subprocess(monkeypatch):
    _with_env(monkeypatch, "cpu", None)
    assert not _env_has_virtual_cpu_devices(8)
    _with_env(monkeypatch, None, "--xla_force_host_platform_device_count=8")
    assert not _env_has_virtual_cpu_devices(8)
