"""Plain-torch re-implementation of the reference DS-GPS training loop.

A falsification oracle for docs/dsgps_dynamics.md: reproduces
dirichlet/dsgps/model.py (update equations :74-89, freeze-semantics enc/
autoenc losses :100-112, gamma-discounted loss :116-119) and its trainer
(torch Adam lr 1e-3 + clip_grad_norm_ 0.01) with no PyG dependency
(index_add scatter, COO SpMV), trained on the SAME samples as the jax run
via psignn_tpu.data.reader.  Its trajectory plateaus at the same values as
the jax framework (docs/oracle_dsgps_run.log), isolating the plateau to the
data/lr regime rather than the TPU rebuild.
"""
import argparse, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, torch, torch.nn as nn
torch.manual_seed(1234); np.random.seed(1234)
from psignn_tpu.data.reader import load_dataset

_ap = argparse.ArgumentParser()
_ap.add_argument("--path_dataset", default="data/dirichlet",
                 help="dataset dir")
_ap.add_argument("--limit", type=int, default=600,
                 help="use only the first N samples (the round-3 plateau "
                      "study ran on a 600-sample subset; 0 = full set)")
_ap.add_argument("--epochs", type=int, default=40)
_args = _ap.parse_args()
samples = load_dataset(_args.path_dataset, family="dsgps", variant="dirichlet")
if _args.limit:
    samples = samples[:_args.limit]
train = samples[:int(0.6 * len(samples))]
print("train samples", len(train))

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
class DSGPS(nn.Module):
    def __init__(s):
        super().__init__()
        s.phi_to = mk_mlp([2*D+3, D, D], nn.ReLU())
        s.phi_from = mk_mlp([2*D+3, D, D], nn.ReLU())
        s.z_k = mk_mlp([3*D+2, D], nn.Sigmoid(), True)
        s.r_k = mk_mlp([3*D+2, D], nn.Sigmoid(), True)
        s.corr = mk_mlp([3*D+2, D], nn.Tanh(), True)
        s.enc = mk_mlp([1, D, D], nn.ReLU())
        s.dec = mk_mlp([D, D, 1], nn.ReLU())

def batch_of(chunk):
    off, xs, bs, sols, prbs, tags, snd, rcv, aij, ea = 0, [],[],[],[],[],[],[],[],[]
    for s in chunk:
        N = s["x"].shape[0]
        xs.append(s["x"]); bs.append(s["b"]); sols.append(s["sol"]); prbs.append(s["prb_data"])
        tags.append(s["tags"]); snd.append(s["senders"]+off); rcv.append(s["receivers"]+off)
        aij.append(s["a_ij"]); ea.append(s["edge_attr"]); off += N
    t = lambda a: torch.tensor(np.concatenate(a), dtype=torch.float32)
    ti = lambda a: torch.tensor(np.concatenate(a), dtype=torch.long)
    g = dict(x=t(xs), b=t(bs), sol=t(sols), prb=t(prbs), tags=t(tags),
             snd=ti(snd), rcv=ti(rcv), aij=t(aij), ea=t(ea), N=off)
    # Message passing excludes self-loop (diagonal) edges, matching both the
    # reference (remove_self_loops in Phi_to/Phi_from, dirichlet/dsgps/
    # model.py:235) and the jax framework (mp_edge_mask, graphs.py:123); the
    # residual SpMV below keeps the full edge set including the diagonal.
    nsl = g["snd"] != g["rcv"]
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
    dmask = (g["tags"][:, 0] == 1)
    U0 = g["x"]
    H0 = m.enc(U0); H = H0
    total = 0.0; mseL = nn.MSELoss()
    for u in range(k):
        mt = mp(m.phi_to, H, g["snd_mp"], g["rcv_mp"], g["ea_mp"], g["N"], "to")
        mf = mp(m.phi_from, H, g["snd_mp"], g["rcv_mp"], g["ea_mp"], g["N"], "from")
        cat = torch.cat([H, mt, mf, g["prb"]], 1)
        alpha = m.z_k(cat); reset = m.r_k(cat)
        corr = m.corr(torch.cat([reset*H, mt, mf, g["prb"]], 1))
        H = H + alpha*corr
        H = torch.where(dmask[:, None], H0, H)
        U = m.dec(H)
        Au = torch.zeros_like(U).index_add(0, g["snd"], g["aij"] * U[g["rcv"]])
        res = ((Au - g["b"])**2).mean()
        for p in m.dec.parameters(): p.requires_grad_(False)
        enc_l = mseL(m.enc(m.dec(H)), H)
        for p in m.dec.parameters(): p.requires_grad_(True)
        for p in m.enc.parameters(): p.requires_grad_(False)
        auto_l = mseL(m.dec(m.enc(U)), U)
        for p in m.enc.parameters(): p.requires_grad_(True)
        total = total + res * gamma**(k-u-1) + enc_l + auto_l
    return total, float(res), float(auto_l)

model = DSGPS()
opt = torch.optim.Adam(model.parameters(), lr=1e-3)
step = 0
for ep in range(_args.epochs):
    order = np.random.permutation(len(train))
    t0 = time.time()
    for i in range(0, len(train), 50):
        g = batch_of([train[j] for j in order[i:i+50]])
        opt.zero_grad()
        loss, res, auto = forward(model, g)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.01)
        opt.step(); step += 1
    print(f"ep {ep} steps {step} loss {float(loss):10.3f} res {res:8.4f} auto {auto:7.4f} ({time.time()-t0:.0f}s)", flush=True)
