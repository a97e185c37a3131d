"""Multi-host (2-process) distributed training smoke test.

The reference has no multi-host story at all (SURVEY §5.8: single-process
DataParallel only). Our framework claims jax.distributed over DCN; this test
actually executes that path: two OS processes, each with 2 virtual CPU
devices, joined by jax.distributed.initialize into one 4-device global mesh,
running two real sharded train steps. Asserts (a) both processes compute the
same loss, (b) it matches a single-process 4-device run bit-for-bit in
float32 tolerance.
"""
import os
import re
import subprocess
import sys
import socket

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', '_mh_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i), '2'],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('multi-host worker timed out')
        outs.append(out)

    losses = {}
    for out, p in zip(outs, procs):
        m = re.search(r'MH_RESULT (\d+) ([\d.eE+-]+)', out)
        assert p.returncode == 0 and m, f'worker failed:\n{out[-3000:]}'
        losses[int(m.group(1))] = float(m.group(2))

    assert set(losses) == {0, 1}
    # both controllers agree on the global loss
    assert losses[0] == losses[1], losses

    # and the 2-process global mesh reproduces a single-process 4-device run
    import jax
    import jax.numpy as jnp  # noqa: F401
    from turboae_tpu.config import Config
    from turboae_tpu.dist.mesh import make_mesh
    from turboae_tpu.train.trainer import Trainer
    cfg = Config(batch_size=16, block_len=16, enc_num_unit=8, dec_num_unit=8,
                 enc_num_layer=2, dec_num_layer=2, num_iteration=2,
                 num_iter_ft=3, num_block=16)
    tr = Trainer(cfg, mesh=make_mesh((4,)))
    params, opt_state, _ = tr._step_dec(tr.params, tr.opt_state,
                                        jax.random.PRNGKey(123))
    _, _, loss = tr._step_dec(params, opt_state, jax.random.PRNGKey(124))
    assert abs(float(loss) - losses[0]) < 1e-4, (float(loss), losses)
