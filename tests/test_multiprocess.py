"""Multi-process distributed CG: 2 processes x 4 virtual CPU devices.

The reference's flagship capability is multi-NODE CG — MPI_Allreduce /
MPI_Allgatherv across ranks (ConjugateGradient_CPU_MPI_OMP.hpp:464,505)
and the NCCL bootstrap (..._NCCL.cu:309-327). These tests prove the
rebuild's jax.distributed path END-TO-END in real separate processes:

  * subprocess workers bootstrap via a local coordinator
    (jax.distributed.initialize + Gloo cross-process collectives);
  * each process loads ONLY its row blocks from the shared matrix file
    (jax.make_array_from_callback invokes the reader for addressable
    shards only — the MPI-IO per-rank seek+read analog);
  * the shard_map CG program runs with cross-process psum/all_gather/
    ppermute;
  * rank 0's solution file matches the single-process solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from lam_tpu import generate as gen
from lam_tpu import io as lio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 384


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    # workers choose their own virtual device count (--local-devices);
    # the conftest's 8-device flag must not leak in
    env.pop("XLA_FLAGS", None)
    return env


def _run_cluster(cmd_for, nproc=2, timeout=300):
    """Launch nproc processes, return their outputs; fail on any rc != 0."""
    procs = [
        subprocess.Popen(cmd_for(pid), cwd=REPO, env=_worker_env(),
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args} failed:\n{out}"
    return outs


@pytest.fixture(scope="module")
def system_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("mp")
    a, b = gen.random_spd_system(N, seed=77)
    lio.write_matrix(d / "m.bin", a)
    lio.write_matrix(d / "r.bin", b)
    return d, a, b


def _single_process_solution(a, b):
    from lam_tpu import DenseOperator, cg_solve
    op = DenseOperator.from_dense(a, precision="f64", engine="xla")
    res = cg_solve(op, b, max_iters=2000, rel_error=1e-9)
    assert bool(res.converged)
    return np.asarray(res.x), int(res.num_iters)


@pytest.mark.parametrize("comm", ["gather", "ring"])
def test_multiprocess_cli_matches_single_process(system_files, comm):
    d, a, b = system_files
    port = _free_port()
    sol = d / f"sol_{comm}.bin"

    def cmd(pid):
        return [sys.executable, "-m", "lam_tpu.cli",
                "-A", str(d / "m.bin"), "-b", str(d / "r.bin"),
                "-o", str(sol), "-i", "2000", "-e", "1e-9",
                "--backend", "sharded", "--comm", comm,
                "--precision", "f64", "--platform", "cpu",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--local-devices", "4"]

    outs = _run_cluster(cmd)
    # rank-0-only output: exactly one process prints the CSV row
    csv_rows = [ln for out in outs for ln in out.strip().splitlines()
                if ln.startswith(f"{N},")]
    assert len(csv_rows) == 1, outs
    fields = csv_rows[0].split(",")
    assert int(fields[1]) == 8          # procs column: 2 x 4 devices
    assert float(fields[7]) < 1e-9      # converged recurrence residual

    x_mp = lio.read_vector(sol)
    x_sp, iters_sp = _single_process_solution(a, b)
    # same system, same tolerance: both true residuals at 1e-9 quality
    bnorm = np.linalg.norm(b)
    assert np.linalg.norm(b - a @ x_mp) / bnorm < 1e-8
    assert np.linalg.norm(x_mp - x_sp) / np.linalg.norm(x_sp) < 1e-6
    assert abs(int(fields[6]) - iters_sp) <= max(3, iters_sp // 20)


def test_multiprocess_worker_harness():
    """The scripts/mp_worker.py harness used by dryrun_multichip: both
    comm strategies converge and self-verify across 2 processes."""
    port = _free_port()

    def cmd(pid):
        return [sys.executable, os.path.join(REPO, "scripts",
                                             "mp_worker.py"),
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--local-devices", "4", "-n", "384"]

    outs = _run_cluster(cmd)
    joined = "\n".join(outs)
    assert "MP_OK comm=gather" in joined
    assert "MP_OK comm=ring" in joined
    assert "MP_OK comm=symm" in joined   # band-pair operator x-process
    assert "MP_OK comm=symm-fq" in joined  # fq cascade x-process
    assert "MP_OK comm=heat-halo" in joined  # x-process halo exchange
