"""Multi-host training parity: two jax.distributed processes (2 virtual CPU
devices each) running train_img must match the single-process 4-device run
step-for-step — same updated params, same full-test-set bpd.

The reference has no multi-host story (its only parallelism is
single-process ``nn.DataParallel``, ``/root/reference/train_img.py:203-204``);
this certifies the TPU-native multi-controller design
(``parallel/multihost.py``): global mesh over all processes' devices,
process-sharded host data feed, process-0-only checkpointing.
"""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = """[
    "--data", "cifar10", "--synthetic-data", "True", "--actnorm", "True",
    "--nblocks", "1-1", "--idim", "16", "--act", "swish", "--kernels", "3-1-3",
    "--vnorms", "2222", "--fc-end", "False", "--preact", "True",
    "--coeff", "0.9", "--n-exact-terms", "2", "--imagesize", "8",
    "--batchsize", "8", "--val-batchsize", "8", "--nepochs", "1",
    "--max-iters-per-epoch", "2", "--print-freq", "1", "--seed", "0",
    "--vis-freq", "0", "--save", SAVE]
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(code, n_local_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, env=env, cwd=REPO)


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    port = _free_port()
    save_mh = str(tmp_path / "mh")
    save_sp = str(tmp_path / "sp")

    def proc_code(pid):
        return f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {REPO!r})
SAVE = {save_mh!r}
import train_img
train_img.main({ARGS} + ["--coordinator", "127.0.0.1:{port}",
                         "--num-processes", "2", "--process-id", "{pid}"])
"""

    single_code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, {REPO!r})
SAVE = {save_sp!r}
import train_img
train_img.main({ARGS})
"""

    p0 = _spawn(proc_code(0), 2)
    p1 = _spawn(proc_code(1), 2)
    out0, err0 = p0.communicate(timeout=1200)
    out1, err1 = p1.communicate(timeout=1200)
    assert p0.returncode == 0, err0[-3000:]
    assert p1.returncode == 0, err1[-3000:]

    ps = _spawn(single_code, 4)
    outs, errs = ps.communicate(timeout=1200)
    assert ps.returncode == 0, errs[-3000:]

    with open(os.path.join(save_mh, "most_recent.pkl"), "rb") as f:
        mh = pickle.load(f)
    with open(os.path.join(save_sp, "most_recent.pkl"), "rb") as f:
        sp = pickle.load(f)
    # process-0-only writes: no second copy of the checkpoint
    assert not os.path.exists(os.path.join(save_mh + ".p1", "most_recent.pkl"))

    import jax
    leaves_mh = jax.tree.leaves(mh["params"])
    leaves_sp = jax.tree.leaves(sp["params"])
    assert len(leaves_mh) == len(leaves_sp)
    for a, b in zip(leaves_mh, leaves_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert abs(float(mh["test_bpd"]) - float(sp["test_bpd"])) < 1e-5
