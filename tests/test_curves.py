"""Training-curve parity parser (eval/curves.py) vs both log formats."""

import os

from psignn_tpu.eval.curves import compare, parse_epoch_times, parse_val

REF_DSS = ("/root/reference/dirichlet/dss/results/dss_results/logs/"
           "train_metrics.csv")

OURS = """Train Metrics
Epoch 0, 25% \t Loss : 1.0e+02 \t Res : 1.0e+01 \t MSE : 6.0e+01
Training Epoch 0 : \t Train : 5.0e+01 \t Res : 5.0e+00 \t Jac : 0.0e+00 \t Enc : 0.0e+00 \t AE : 0.0e+00 \t MSE : 4.7e+01
Validation Epoch 0 : \t Train : 1.2e+01 \t Res : 4.0e-01 \t Jac : 0.0e+00 \t Enc : 0.0e+00 \t AE : 0.0e+00 \t MSE : 3.0e+01
Training Epoch 0 finished, took current epoch 42.5s, cumulative time 42.5s
Training Epoch 1 : \t Train : 2.0e+01 \t Res : 2.0e+00 \t Jac : 0.0e+00 \t Enc : 0.0e+00 \t AE : 0.0e+00 \t MSE : 2.0e+01
Validation Epoch 1 : \t Train : 6.0e+00 \t Res : 2.0e-01 \t Jac : 0.0e+00 \t Enc : 0.0e+00 \t AE : 0.0e+00 \t MSE : 1.5e+01
Training Epoch 1 finished, took current epoch 40.0s, cumulative time 82.5s
"""


def test_parse_our_format(tmp_path):
    p = tmp_path / "train_metrics.csv"
    p.write_text(OURS)
    vals = parse_val(str(p))
    assert vals == {0: (0.4, 30.0), 1: (0.2, 15.0)}
    times = parse_epoch_times(str(p))
    assert times == {0: 42.5, 1: 40.0}


def test_parse_reference_format():
    if not os.path.exists(REF_DSS):
        import pytest
        pytest.skip("reference logs not present")
    vals = parse_val(REF_DSS)
    # golden endpoints from BASELINE.md / VERDICT
    assert abs(vals[399][0] - 9.65033e-4) < 1e-8
    assert vals[0][0] > vals[399][0]
    assert len(vals) == 400


def test_compare_matched_epochs(tmp_path):
    p = tmp_path / "train_metrics.csv"
    p.write_text(OURS)
    if not os.path.exists(REF_DSS):
        import pytest
        pytest.skip("reference logs not present")
    rows, ov, rv = compare(str(p), REF_DSS, checkpoints=(0, 1, 399))
    # epoch 399 clamps to our last epoch (1)
    assert [r[0] for r in rows] == [0, 1, 399]
    assert rows[2][1] == 1
    assert rows[0][2] == 0.4 and abs(rows[0][4] - 0.4 / rv[0][0]) < 1e-9
