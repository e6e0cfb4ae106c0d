import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from psignn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from psignn_tpu.models.dsgps import DsgpsConfig, dsgps_init
from psignn_tpu.train.optim import init_adam

psi = load_checkpoint("results/psignn_dirichlet/ckpt/running_model.ckpt")
ae = psi["params"]["autoencoder"]
params = dsgps_init(jax.random.PRNGKey(1234), DsgpsConfig(k=30, gamma=0.9))
print("psignn ae keys:", list(ae.keys()))
params["autoencoder"] = {"encoder": ae["encoder"], "decoder": ae["decoder"]}
state = dict(
    params=params, opt_state=init_adam(params),
    hist_train={k: [] for k in ("loss","res","jac","enc","autoenc","mse")},
    hist_val={k: [] for k in ("loss","res","jac","enc","autoenc","mse")},
    min_loss_save=1e10, training_time=0.0, epoch=0, family="dsgps",
)
# match the trainer's checkpoint schema
tr = load_checkpoint("results/dsgps_dirichlet_lr1e3_plateau/ckpt/running_model.ckpt")
for k in tr:
    if k not in state: state[k] = tr[k]
state["params"] = params; state["opt_state"] = init_adam(params)
for k in ("hist_train", "hist_val"):
    state[k] = {kk: [] for kk in tr[k]}
state["min_loss_save"] = 1e10; state["training_time"] = 0.0
if "epoch" in tr: state["epoch"] = 0
save_checkpoint(state, "/tmp/warmae_ckpt", "warm_init")
print("saved; leaf check:", jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(tr["params"]))
