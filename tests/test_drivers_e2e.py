"""End-to-end driver tests: train_img saves a checkpoint that
qualitative_samples can render from (the reference's workflow,
qualitative_samples.py:428-474)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=1500)


@pytest.mark.slow
def test_train_then_sample(tmp_path):
    save = str(tmp_path / "exp")
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["train_img.py", "--data", "cifar10", "--synthetic-data", "True",
            "--actnorm", "True", "--nblocks", "1-1", "--idim", "16",
            "--act", "swish", "--kernels", "3-1-3", "--vnorms", "2222",
            "--fc-end", "False", "--preact", "True", "--coeff", "0.9",
            "--n-exact-terms", "2", "--imagesize", "8", "--batchsize", "8",
            "--val-batchsize", "8", "--nepochs", "1",
            "--max-iters-per-epoch", "2", "--save", {save!r},
            "--print-freq", "1", "--seed", "0", "--vis-freq", "0"]
import runpy
runpy.run_path("train_img.py", run_name="__main__")
"""
    r = _run(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(save, "most_recent.pkl"))

    out = str(tmp_path / "samples.png")
    code2 = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["qualitative_samples.py", "--ckpt", {os.path.join(save, 'most_recent.pkl')!r},
            "--out", {out!r}, "--nsamples", "4", "--nrow", "2",
            "--temperature", "0.7"]
import runpy
runpy.run_path("qualitative_samples.py", run_name="__main__")
"""
    r2 = _run(code2)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert os.path.exists(out)


@pytest.mark.slow
def test_train_then_sample_iresnet(tmp_path):
    """Legacy ResidualFlow family: 2 train steps of --arch iresnet on images,
    then sample from the checkpoint (reference qualitative_samples.py:428-474
    renders ResidualFlow checkpoints)."""
    save = str(tmp_path / "exp_ires")
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["train_img.py", "--data", "cifar10", "--synthetic-data", "True",
            "--arch", "iresnet", "--actnorm", "True", "--nblocks", "1-1",
            "--idim", "16", "--act", "swish", "--kernels", "3-1-3",
            "--vnorms", "2222", "--fc-end", "False", "--preact", "True",
            "--coeff", "0.9", "--n-exact-terms", "2", "--imagesize", "8",
            "--batchsize", "8", "--val-batchsize", "8", "--nepochs", "1",
            "--max-iters-per-epoch", "2", "--save", {save!r},
            "--print-freq", "1", "--seed", "0", "--vis-freq", "0"]
import runpy
runpy.run_path("train_img.py", run_name="__main__")
"""
    r = _run(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(save, "most_recent.pkl"))

    out = str(tmp_path / "samples_ires.png")
    code2 = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["qualitative_samples.py", "--ckpt", {os.path.join(save, 'most_recent.pkl')!r},
            "--out", {out!r}, "--nsamples", "4", "--nrow", "2",
            "--temperature", "0.7"]
import runpy
runpy.run_path("qualitative_samples.py", run_name="__main__")
"""
    r2 = _run(code2)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert os.path.exists(out)


@pytest.mark.slow
def test_reduced_bits_dataset_init_finite(tmp_path):
    """Regression: for nbits < 8 datasets (celeba_5bit: nvals = 32) the
    model-init batch must apply the bit reduction — the raw (x+0.5)/nvals
    expression fed values up to 8 into the logit transform and NaN'd the
    ActNorm init (found preparing the 64px multiscale artifact)."""
    save = str(tmp_path / "exp5bit")
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.argv = ["train_img.py", "--data", "celeba_5bit", "--nbits", "5",
            "--synthetic-data", "True", "--synthetic-n", "32",
            "--actnorm", "True", "--nblocks", "1", "--idim", "8",
            "--act", "swish", "--kernels", "3-1-3", "--vnorms", "2222",
            "--factor-out", "True", "--fc-end", "False",
            "--preact", "True", "--coeff", "0.9",
            "--n-exact-terms", "1", "--batchsize", "4",
            "--val-batchsize", "4", "--nepochs", "1", "--ndevices", "1",
            "--max-iters-per-epoch", "1", "--save", {save!r},
            "--print-freq", "1", "--seed", "0", "--vis-freq", "0"]
import runpy
runpy.run_path("train_img.py", run_name="__main__")
"""
    r = _run(code)
    assert r.returncode == 0, r.stderr[-3000:]
    log = open(os.path.join(save, "logs")).read()
    assert "nan" not in log.split("Lipschitz constants:")[-1][:200].lower()
    import re
    m = re.search(r"Test bits/dim ([\d.na]+)", log)
    assert m and m.group(1) != "nan", m
