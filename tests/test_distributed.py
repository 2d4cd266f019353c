"""Two-process jax.distributed smoke test (VERDICT round-1 item 10).

Spawns two REAL processes that each call
``gdr_tpu.parallel.distributed.initialize`` against a local coordinator, run
one psum over a 2-device global CPU mesh, and check the collective result —
exercising the exact multi-host bootstrap a TPU pod uses (one process per
host, collectives over the global device set).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, "__REPO__")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from gdr_tpu.parallel.distributed import initialize, process_info

pid = int(sys.argv[1])
ok = initialize(coordinator_address=sys.argv[2], num_processes=2,
                process_id=pid)
assert ok, "initialize() returned False with explicit args"
idx, count = process_info()
assert (idx, count) == (pid, 2), (idx, count)
assert jax.device_count() == 2, jax.devices()          # global view
assert len(jax.local_devices()) == 1

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(jax.devices(), ("dp",))
val = jnp.asarray([float(pid + 1)])                    # 1.0 on p0, 2.0 on p1

@jax.jit
def all_sum(x):
    return jax.lax.psum(x, "dp")

f = jax.shard_map(all_sum, mesh=mesh, in_specs=P("dp"), out_specs=P())
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), val, (2,))
out = f(arr)
import numpy as np
got = float(np.asarray(jax.device_get(out))[0])
assert got == 3.0, got                                 # 1.0 + 2.0 over DCN
print(f"proc {pid}: psum over 2 processes = {got} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("__REPO__", repo))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)       # one local device per process
    procs = [subprocess.Popen([sys.executable, str(script), str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "OK" in out, out


def test_cli_multihost_bootstrap(tmp_path):
    """The CLI wires the same bootstrap: `gdr_tpu --coordinator ...
    --num-processes 2 --process-id i <cmd>` initialises jax.distributed
    before dispatch (the reference's `--nodes` DDP launch, main.py:70,86-104,
    with zero per-process env plumbing)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    res = tmp_path / "res.tsv"
    res.write_text("q1\t3,5,7\t3\t1\nq2\t9,4\t8\t1\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)       # one local device per process
    procs = [subprocess.Popen(
        [sys.executable, "-m", "gdr_tpu.cli",
         "--coordinator", coord, "--num-processes", "2",
         "--process-id", str(i),
         "calculate", "--result", str(res)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("CLI multi-host workers timed out")
        assert p.returncode == 0, err[-2000:]
        assert f"# multi-host: process {i}/2, 2 global devices" in err, err
        assert '"recall1": 0.5' in out, out


def test_single_worker_hostnames_is_not_a_pod(monkeypatch):
    """Dev tunnels export TPU_WORKER_HOSTNAMES=localhost (one host); the
    bootstrap must treat that as single-process instead of aborting every
    CLI run with 'coordinator_address should be defined'."""
    from gdr_tpu.parallel.distributed import initialize
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert initialize(None, None, None) is False
