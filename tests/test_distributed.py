"""2-process jax.distributed smoke test (multi-host data-parallel contract).

The reference coordinates ranks with NCCL process groups + env rendezvous
(ddp_setup, driver :45-54) and DistributedSampler record striding
(Load_datasets.py:25). This launches TWO real Python processes, initialises
jax.distributed over a local coordinator, and asserts that the in-graph
cross-process histogram reduction matches the host-side sum on both ranks
(tests/_dist_child.py).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_reduction(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_dist_child.py")
    port = _free_port()
    env = dict(os.environ)
    # A fresh backend per child; drop the parent pytest's forced 8-device
    # flag so each child provisions its own 2-device CPU mesh.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), "2", str(port), str(tmp_path)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    for pid in range(2):
        assert f"dist child {pid}/2 OK" in outs[pid]
    t0 = np.load(tmp_path / "total_rank0.npy")
    t1 = np.load(tmp_path / "total_rank1.npy")
    np.testing.assert_array_equal(t0, t1)  # ranks agree on the global total
    # Metric sync: both ranks print the SAME cross-rank global average
    # (reference SmoothedValue.synchronize_between_processes).
    # Extract just the number: backend log lines (e.g. Gloo's connection
    # report) can interleave onto the same stdout line without a newline,
    # so taking the raw line tail is flaky.
    avgs = {
        re.search(r"global_avg=(\d+\.\d+)", out).group(1) for out in outs
    }
    assert len(avgs) == 1, outs
