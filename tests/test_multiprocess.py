"""A real multi-process construction: 2 ``jax.distributed`` CPU processes
x 4 virtual devices each = one global 8-shard mesh.

The reference tests multi-node the same way — oversubscribed ``mpiexec``
processes on one machine (SURVEY.md §4, ``.travis.yml:72-90``).  The
worker stages the input from a FILE with per-process shard reads
(``construct_from_file`` -> ``parallel/staging.py``; reference
``src/psac.cpp:85`` ``file_block_decompose``), builds SA+LCP on the global
mesh, runs the fully distributed checker (``d_check_sa``, reference
``check_suffix_array.hpp:206-267``), and cross-checks the gathered result
against the sequential oracle.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; path = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import numpy as np
from psac_tpu.parallel.mesh import make_mesh
from psac_tpu.models.suffix_array import construct_from_file
from psac_tpu.verify.check_sa import d_check_sa

mesh = make_mesh(8)
dsa, xs = construct_from_file(path, mesh=mesh)
assert d_check_sa(dsa, xs), "distributed SA check failed"

# gather to every process and cross-check vs the sequential oracle
from jax.experimental import multihost_utils
sa = np.asarray(multihost_utils.process_allgather(dsa.sa, tiled=True))
lcp = np.asarray(multihost_utils.process_allgather(dsa.lcp, tiled=True))
off = dsa.N - dsa.n
from psac_tpu.ops.oracle import lcp_kasai, suffix_array_np
text = open(path, "rb").read()
want = suffix_array_np(text)
assert np.array_equal(sa[off:], want), "SA != oracle"
assert np.array_equal(lcp[off:], lcp_kasai(text, want)), "LCP != oracle"
print(f"proc {pid}: multiprocess SA+LCP of {dsa.n} bytes OK")
"""


def test_two_process_distributed_build(tmp_path):
    rng = np.random.RandomState(42)
    text = bytes(rng.randint(97, 101, 20000).astype(np.uint8))
    path = tmp_path / "corpus.bin"
    path.write_bytes(text)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon registration would hang
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env.pop("XLA_FLAGS", None)
    port = "39247"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port, str(path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=850)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-4000:]}"
        assert f"proc {i}: multiprocess SA+LCP" in outs[i]
