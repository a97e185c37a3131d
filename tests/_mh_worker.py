"""Multi-host worker: one process of a 2-process jax.distributed job.

Spawned by tests/test_multihost.py. Each process owns 2 virtual CPU devices;
jax.distributed.initialize stitches them into one 4-device global mesh over
which a real train step runs (params/opt/key lifted to global replicated
arrays; the batch shards over the global 'data' axis via GSPMD). This
exercises the DCN path the reference never had (SURVEY §5.8) for real.

Usage: python tests/_mh_worker.py <coordinator_port> <process_id> <n_procs>
Prints one line: MH_RESULT <pid> <loss_repr>
"""
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ.pop('JAX_PLATFORMS', None)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# cross-process CPU collectives need gloo (ICI doesn't exist on host backend)
try:
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from turboae_tpu.dist.mesh import initialize_distributed, make_mesh  # noqa: E402
from turboae_tpu.config import Config  # noqa: E402
from turboae_tpu.train.trainer import Trainer  # noqa: E402

initialize_distributed(f'localhost:{port}', nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * nproc

mesh = make_mesh((2 * nproc,))
cfg = Config(batch_size=16, block_len=16, enc_num_unit=8, dec_num_unit=8,
             enc_num_layer=2, dec_num_layer=2, num_iteration=2, num_iter_ft=3,
             num_block=16)
tr = Trainer(cfg, mesh=mesh)

# Lift process-local (identical-by-seed) state to global replicated arrays —
# multi-controller jit requires every input to be a global jax.Array.
rep = NamedSharding(mesh, P())


def lift(tree):
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        tree)


params = lift(tr.params)
opt_state = lift(tr.opt_state)
key = lift(jax.random.key_data(jax.random.PRNGKey(123)))

params, opt_state, loss = tr._step_dec(params, opt_state,
                                       jax.random.wrap_key_data(key))
params, opt_state, loss = tr._step_dec(params, opt_state,
                                       jax.random.wrap_key_data(
                                           lift(jax.random.key_data(
                                               jax.random.PRNGKey(124)))))
print(f'MH_RESULT {pid} {float(loss)!r}', flush=True)
