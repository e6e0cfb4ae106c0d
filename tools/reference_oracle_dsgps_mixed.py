"""Plain-torch re-implementation of the reference MIXED DS-GPS training loop.

The round-5 falsification oracle for the dsgps-mixed 'exploding encoder
loss' (VERDICT r4 weak #2): our from-scratch mixed run shows val Enc ~ 4e2
from epoch 0 while the reference's own log shows Enc 0.21 at epoch 0
(mixed/dsgps/results/30_ite_lamb_0_gamma_0_9/logs/train_metrics.csv).
This reproduces mixed/dsgps/model.py exactly — Neumann branch (:83,91-97),
DETACHED enc/autoenc semantics (:108-115), gamma-discounted loss
(:119-122) — and the reference trainer (torch Adam lr 1e-3 +
clip_grad_norm_ 0.01), with no PyG dependency, trained on OUR mixed data.

If this oracle's Enc also orbits at ~1e2-1e3, the behavior is a property
of the optimization problem on our mixed dataset realization; if it tames
to ~0.2 within an epoch like the reference's run, our jax training path
has a dynamics bug the activation-parity tests do not cover.
"""
import argparse, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, torch, torch.nn as nn
from psignn_tpu.data.reader import load_dataset, split_dataset

_ap = argparse.ArgumentParser()
_ap.add_argument("--path_dataset", default="data/mixed")
_ap.add_argument("--limit", type=int, default=600,
                 help="use only the first N samples (0 = full set)")
_ap.add_argument("--epochs", type=int, default=30)
_ap.add_argument("--seed", type=int, default=1234)
_ap.add_argument("--neumann_init_scale", type=float, default=1.0,
                 help="scale update_neumann output layer at init (1.0 = "
                      "reference-faithful Xavier)")
_ap.add_argument("--clip", type=float, default=0.01,
                 help="clip_grad_norm_ max-norm (reference: 0.01).  At our "
                      "data's loss scale (~1e3 vs the reference log's ~24) "
                      "the 0.01 clip binds ~100x harder — arms >0.01 test "
                      "whether clip starvation is what pins Enc high")
_ap.add_argument("--lr", type=float, default=1e-3)
_ap.add_argument("--enc_semantics", choices=["detach", "freeze"],
                 default="detach",
                 help="detach = reference mixed semantics "
                      "(mixed/dsgps/model.py:108-115); freeze = the "
                      "DIRICHLET variant's semantics (dsgps/model.py:"
                      "100-112, enc-loss value-gradients flow into H) — "
                      "tests whether the manifold pull the dirichlet "
                      "variant gets for free is what our mixed data "
                      "realization needs to tame Enc")
_args = _ap.parse_args()
torch.manual_seed(_args.seed); np.random.seed(_args.seed)

samples = load_dataset(_args.path_dataset, family="dsgps", variant="mixed")
if _args.limit:
    samples = samples[:_args.limit]
train = samples[:int(0.6 * len(samples))]
val = samples[int(0.6 * len(samples)):int(0.8 * len(samples))]
print("train samples", len(train), "val", len(val))

def xavier(m):
    if isinstance(m, nn.Linear):
        nn.init.xavier_uniform_(m.weight); nn.init.constant_(m.bias, 0)

def mk_mlp(dims, act, final_act=False):
    layers = []
    for i in range(len(dims)-1):
        layers.append(nn.Linear(dims[i], dims[i+1]))
        if i < len(dims)-2 or final_act: layers.append(act)
    m = nn.Sequential(*layers); m.apply(xavier); return m

D = 10
class DSGPSMixed(nn.Module):
    def __init__(s):
        super().__init__()
        s.phi_to = mk_mlp([2*D+3, D, D], nn.ReLU())
        s.phi_from = mk_mlp([2*D+3, D, D], nn.ReLU())
        s.z_k = mk_mlp([3*D+3, D], nn.Sigmoid(), True)
        s.r_k = mk_mlp([3*D+3, D], nn.Sigmoid(), True)
        s.corr = mk_mlp([3*D+3, D], nn.Tanh(), True)
        s.phi_neumann = mk_mlp([2*D+3, D, D], nn.ReLU())
        s.update_neumann = mk_mlp([2*D+5, D, D], nn.ReLU())
        s.enc = mk_mlp([1, D, D], nn.ReLU())
        s.dec = mk_mlp([D, D, 1], nn.ReLU())

def batch_of(chunk):
    off = 0
    cols = {k: [] for k in ("x","b","sol","prb","tags","aij","ea","nrm")}
    snd, rcv = [], []
    for s in chunk:
        N = s["x"].shape[0]
        cols["x"].append(s["x"]); cols["b"].append(s["b"])
        cols["sol"].append(s["sol"]); cols["prb"].append(s["prb_data"])
        cols["tags"].append(s["tags"]); cols["aij"].append(s["a_ij"])
        cols["ea"].append(s["edge_attr"])
        cols["nrm"].append(s["unit_normal_vector"])
        snd.append(s["senders"]+off); rcv.append(s["receivers"]+off)
        off += N
    t = lambda a: torch.tensor(np.concatenate(a), dtype=torch.float32)
    ti = lambda a: torch.tensor(np.concatenate(a), dtype=torch.long)
    g = {k: t(v) for k, v in cols.items()}
    g["snd"], g["rcv"], g["N"] = ti(snd), ti(rcv), off
    nsl = g["snd"] != g["rcv"]   # MP excludes self-loops (remove_self_loops)
    g["snd_mp"], g["rcv_mp"], g["ea_mp"] = g["snd"][nsl], g["rcv"][nsl], g["ea"][nsl]
    return g

def mp(mlp, h, snd, rcv, ea, N, direction):
    if direction == "to":
        xi, xj, agg = h[rcv], h[snd], rcv
    else:
        xi, xj, agg = h[snd], h[rcv], snd
    msg = mlp(torch.cat([xi, xj, ea], 1))
    out = torch.zeros(N, msg.shape[1])
    return out.index_add(0, agg, msg)

def forward(m, g, k=30, gamma=0.9):
    dmask = (g["tags"][:, 1] == 1)
    nmask = (g["tags"][:, 2] == 1)
    U0 = g["x"]
    H0 = m.enc(U0); H = H0
    total = 0.0; mseL = nn.MSELoss()
    for u in range(k):
        mt = mp(m.phi_to, H, g["snd_mp"], g["rcv_mp"], g["ea_mp"], g["N"], "to")
        mf = mp(m.phi_from, H, g["snd_mp"], g["rcv_mp"], g["ea_mp"], g["N"], "from")
        mn = mp(m.phi_neumann, H, g["snd_mp"], g["rcv_mp"], g["ea_mp"], g["N"], "from")
        cat = torch.cat([H, mt, mf, g["prb"]], 1)
        alpha = m.z_k(cat); reset = m.r_k(cat)
        corr = m.corr(torch.cat([reset*H, mt, mf, g["prb"]], 1))
        upd_neu = m.update_neumann(torch.cat([H, mn, g["prb"], g["nrm"]], 1))
        H = H + alpha*corr
        H = torch.where(nmask[:, None], upd_neu, H)
        H = torch.where(dmask[:, None], H0, H)
        U = m.dec(H)
        Au = torch.zeros_like(U).index_add(0, g["snd"], g["aij"] * U[g["rcv"]])
        res = ((Au - g["b"])**2).mean()
        if _args.enc_semantics == "freeze":
            for p in m.dec.parameters(): p.requires_grad_(False)
            enc_l = mseL(m.enc(m.dec(H)), H)
            for p in m.dec.parameters(): p.requires_grad_(True)
            for p in m.enc.parameters(): p.requires_grad_(False)
            auto_l = mseL(m.dec(m.enc(U)), U)
            for p in m.enc.parameters(): p.requires_grad_(True)
        else:
            u_det = U.detach(); h_det = H.detach()
            enc_l = mseL(m.enc(u_det), h_det)
            auto_l = mseL(m.dec(m.enc(u_det).detach()), u_det)
        total = total + res * gamma**(k-u-1) + enc_l + auto_l
    return total, float(res), float(enc_l), float(auto_l)

model = DSGPSMixed()
if _args.neumann_init_scale != 1.0:
    with torch.no_grad():
        model.update_neumann[-1].weight.mul_(_args.neumann_init_scale)
opt = torch.optim.Adam(model.parameters(), lr=_args.lr)
step = 0
for ep in range(_args.epochs):
    order = np.random.permutation(len(train))
    t0 = time.time()
    for i in range(0, len(train), 50):
        g = batch_of([train[j] for j in order[i:i+50]])
        opt.zero_grad()
        loss, res, enc, auto = forward(model, g)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), _args.clip)
        opt.step(); step += 1
    # quick val on one 50-graph batch
    with torch.no_grad():
        gv = batch_of(val[:50])
        vloss, vres, venc, vauto = forward(model, gv)
    print(f"ep {ep} steps {step} loss {float(loss):10.3f} res {res:8.4f} "
          f"enc {enc:9.4f} auto {auto:7.4f} | val res {vres:8.4f} "
          f"enc {venc:9.4f} ({time.time()-t0:.0f}s)", flush=True)
