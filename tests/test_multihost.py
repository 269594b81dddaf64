"""Multi-process (multi-host analogue) correctness gate.

The distributed equivalent of the reference's subcatchment
mask-independence property (tests/test_subcatchments.py:32-118): the SAME
model run as 2 jax.distributed processes (4 CPU devices each, Gloo
collectives) must be BIT-IDENTICAL to the single-process 8-device run and
to the 1-device run — process count changes placement, never values,
because the logical shard structure is fixed (ops/kinwave_sharded.py).

Each topology runs in fresh subprocesses (jax.distributed must own the
backend from the start, which an in-process pytest cannot provide)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _launch(nprocs, cpu_devices, out, steps=3, port=29512, kernel="sharded"):
    """Run the multihost demo as nprocs OS processes; returns rank-0 state."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # per-process device count set inside
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for rank in range(nprocs):
        cmd = [sys.executable, "-m", "lisflood_tpu.parallel.multihost",
               "--rank", str(rank), "--nprocs", str(nprocs),
               "--steps", str(steps), "--cpu-devices", str(cpu_devices),
               "--coordinator", f"localhost:{port}",
               "--kernel", kernel]
        if rank == 0:
            cmd += ["--out", out]
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    fail = []
    for rank, p in enumerate(procs):
        try:
            out_bytes, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out_bytes, _ = p.communicate()
            fail.append((rank, "timeout", out_bytes))
            continue
        if p.returncode != 0:
            fail.append((rank, p.returncode, out_bytes))
    assert not fail, "\n".join(
        f"rank {r} rc={rc}:\n{ob.decode(errors='replace')[-2000:]}" for r, rc, ob in fail)
    return dict(np.load(out))


@pytest.mark.slow
def test_two_process_bitwise_equals_single_process(tmp_path):
    s1 = _launch(1, 8, str(tmp_path / "p1.npz"), port=29521)
    s2 = _launch(2, 4, str(tmp_path / "p2.npz"), port=29522)
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_array_equal(s2[k], s1[k], err_msg=k)
    # and the 1-device run (no sharding at all) matches too
    s0 = _launch(1, 1, str(tmp_path / "p0.npz"), port=29523)
    for k in s1:
        np.testing.assert_array_equal(s0[k], s1[k], err_msg=k)
    # sanity: the run did something
    assert np.asarray(s1["ChanQKin"]).max() > 0
