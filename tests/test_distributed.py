"""Real multi-process execution test: 2 jax.distributed processes on
localhost, 4 virtual CPU devices each, one sharded SHAC epoch over the
8-device global data mesh (the DCN code path multi-host pods use).

The reference's only distributed machinery is the (in-repo untested)
Horovod wrapper (externals/rl_games/rl_games/distributed/hvd_wrapper.py);
this exercises our equivalent end-to-end across process boundaries.
"""

import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tools", "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_shac_epoch():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=_REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for o in outs:
        assert o["processes"] == 2
        assert o["global_devices"] == 8
        assert o["local_devices"] == 4

    # SPMD: both processes computed the identical replicated losses
    assert outs[0]["actor_loss"] == outs[1]["actor_loss"]
    assert outs[0]["value_loss"] == outs[1]["value_loss"]
