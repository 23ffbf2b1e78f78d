"""Multi-host DCN harness: a 2-process CPU run (Gloo collectives over the
distributed runtime) must compute EXACTLY the same sharded train-step loss
as the equivalent single-process 4-device run."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _loss(out: str) -> float:
    m = re.search(r"loss=([-\d.]+)", out)
    assert m, out
    return float(m.group(1))


@pytest.mark.slow
def test_dcn_two_process_matches_single():
    port = _free_port()
    env = {"PYTHONPATH": REPO}
    env.update({k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    mod = "ominix_mlx_tpu.parallel.multihost"
    procs = [subprocess.Popen(
        [sys.executable, "-m", mod, "--rank", str(r), "--nprocs", "2",
         "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
        cwd=REPO) for r in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (so, se[-800:])
    losses = [_loss(so) for so, _ in outs]
    assert losses[0] == losses[1]

    single = subprocess.run(
        [sys.executable, "-m", mod, "--rank", "0", "--single",
         "--nprocs", "2"],
        capture_output=True, text=True, cwd=REPO,
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        timeout=300)
    assert single.returncode == 0, single.stderr[-800:]
    ref = _loss(single.stdout)
    assert abs(losses[0] - ref) < 1e-6, (losses, ref)
