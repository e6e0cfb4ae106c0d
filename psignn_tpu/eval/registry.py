"""Single registry of training runs ↔ log paths (ours + reference).

One place for the run-name → train_metrics.csv mapping that the curve
tables (tools/make_curves.py) and comparison figures
(tools/make_figures.py) both consume — previously triplicated and
already drifted (advisor r5 finding).  Paths are absolute, rooted at the
repo, so notebook/cwd-independent.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REF = "/root/reference"

REF_CURVES = {
    "psignn": f"{REF}/dirichlet/psignn/results/constant_dataset/logs/train_metrics.csv",
    "dsgps": f"{REF}/dirichlet/dsgps/results/constant_dataset/30_ite_gamma_0_9/logs/train_metrics.csv",
    "dss": f"{REF}/dirichlet/dss/results/dss_results/logs/train_metrics.csv",
    "psignn_mixed": f"{REF}/mixed/psignn/results/best_model/logs/train_metrics.csv",
    "dsgps_mixed": f"{REF}/mixed/dsgps/results/30_ite_lamb_0_gamma_0_9/logs/train_metrics.csv",
    "dsgps_k70": f"{REF}/dirichlet/dsgps/results/constant_dataset/70_ite_gamma_1/logs/train_metrics.csv",
}

OUR_CURVES = {
    "psignn": f"{REPO}/results/psignn_dirichlet/logs/train_metrics.csv",
    "dsgps": f"{REPO}/results/dsgps_dirichlet/logs/train_metrics.csv",
    "dss": f"{REPO}/results/dss_dirichlet/logs/train_metrics.csv",
    "psignn_mixed": f"{REPO}/results/psignn_mixed/logs/train_metrics.csv",
    "dsgps_mixed": f"{REPO}/results/dsgps_mixed/logs/train_metrics.csv",
    "dsgps_k70": f"{REPO}/results/dsgps_k70_g1/logs/train_metrics.csv",
}
