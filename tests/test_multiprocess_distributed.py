"""Two-process jax.distributed bring-up (SURVEY.md §4 multi-host row).

Spawns two fresh CPU-only Python processes that rendezvous through
``initialize_distributed`` and each verify the global topology.  This
exercises the real coordinator/client handshake the TPU-pod path uses —
the closest thing to multi-host available on one machine.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
from ldagibbssampling_tpu.parallel.multihost import initialize_distributed

pid = int(sys.argv[1]); coord = sys.argv[2]
topo = initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert topo.process_count == 2, topo
assert topo.process_index == pid, topo
assert topo.global_device_count == 2, topo
assert topo.local_device_count == 1, topo
print(f"proc {pid} ok")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(120)
def test_two_process_distributed_initialize(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the TPU sitecustomize registration
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=90)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed rendezvous timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out
