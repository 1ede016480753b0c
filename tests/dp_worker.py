"""Worker process for the 2-process x 4-device DP rehearsal test.

Usage: python tests/dp_worker.py <process_id> <coordinator_port> <out.json>

The standard multi-host rehearsal (SURVEY.md section 4 item 4, VERDICT
r2 item 9): two OS processes, each owning 4 virtual CPU devices, join
one jax.distributed cluster; the 8-device global mesh shards the
instance batch across processes; jit-inserted collectives cross the
process boundary.  Each worker writes its results to a JSON the test
compares across workers and against a single-process reference.
"""

import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np                                     # noqa: E402
import jax                                             # noqa: E402
import jax.numpy as jnp                                # noqa: E402

from lpbox_admm_tpu.parallel import mesh as pmesh      # noqa: E402

pmesh.init_distributed(coordinator=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

from lpbox_admm_tpu.adapters import ca                 # noqa: E402
from lpbox_admm_tpu.config import LP_CONFIG, PolicyConfig  # noqa: E402
from lpbox_admm_tpu.core import lp                     # noqa: E402
from lpbox_admm_tpu.models.policy import build_policy  # noqa: E402
from lpbox_admm_tpu.train.imitation import PolicyTrainer  # noqa: E402

mesh = pmesh.make_mesh()
cfg = LP_CONFIG.replace(linsolve="woodbury")

# identical host-side batch in both processes (seeded)
rng = np.random.RandomState(3)
insts = [ca.generate_cauction(rng, n_items=20, n_bids=60)
         for _ in range(8)]
prob_h = jax.tree_util.tree_map(np.asarray, ca.make_problem(insts))
gprob = pmesh.host_to_global(prob_h, mesh)


@jax.jit
def solve200(p):
    st = lp.init_state(p, cfg)
    st, _ = lp.solve_window(st, p, cfg, 200, record=False, skip_cvg_at=0)
    return lp.objective(st)


objs = solve200(gprob)
from jax.experimental import multihost_utils           # noqa: E402

# tiled=True: concatenate the per-process shards back to the global (8,)
objs_h = np.asarray(multihost_utils.process_allgather(objs, tiled=True))

# one data-parallel policy gradient step on a sharded episode batch:
# the jit-inserted gradient reduction crosses the process boundary
pcfg = PolicyConfig(net="mlp")
model = build_policy("mlp")
trainer = PolicyTrainer(model, pcfg, cfg, ws=100)
ts = trainer.init(jax.random.PRNGKey(0), jnp.zeros((2, 20, 5)))
rng2 = np.random.RandomState(5)
x_h = rng2.rand(64, 20, 5).astype(np.float32)
l_h = (rng2.rand(64) > 0.5).astype(np.float32)
w_h = np.ones(64, np.float32)
xb, lb, wb = (pmesh.host_to_global(a, mesh) for a in (x_h, l_h, w_h))
ts2, loss = trainer._train_step(ts, xb, lb, wb)
# loss and params come out replicated -> fully addressable
loss = float(loss)
p0 = float(np.asarray(
    jax.tree_util.tree_leaves(ts2.params)[0]).ravel()[0])

with open(out_path, "w") as f:
    json.dump({"pid": pid, "objs": objs_h.tolist(), "loss": loss,
               "param0": p0,
               "n_devices": len(jax.devices()),
               "n_local": len(jax.local_devices())}, f)
print(f"worker {pid} done", flush=True)
