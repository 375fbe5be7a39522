"""OTAC-style scheduler analogue: solver properties + rx_sched main flow."""
import os

import numpy as np
import pytest

from dvbs2_tpu.harness import scheduler


def test_solve_balances_bottleneck():
    # one dominant stage: must get most resources
    times = [1e-3, 8e-3, 1e-3]
    b, groups = solve_check(times, R=10)
    # bottleneck can't beat total/R, must not exceed max single time
    assert b >= sum(times) / 10 - 1e-12
    assert b <= max(times)
    # the heavy stage must be alone in a group with the lion's share
    heavy = [g for g in groups if g[0] <= 1 < g[1]]
    assert heavy and heavy[0][2] >= 6


def solve_check(times, R):
    b, groups = scheduler.solve(times, R)
    # groups tile the chain contiguously
    assert groups[0][0] == 0 and groups[-1][1] == len(times)
    for (g1, g2) in zip(groups, groups[1:]):
        assert g1[1] == g2[0]
    assert sum(g[2] for g in groups) <= R
    # reported bottleneck consistent with the grouping
    bb = max(sum(times[j:i]) / rho for (j, i, rho) in groups)
    np.testing.assert_allclose(b, bb, rtol=1e-9)
    return b, groups


def test_solve_single_resource_is_serial():
    times = [2e-3, 3e-3, 1e-3]
    b, groups = scheduler.solve(times, 1)
    assert len(groups) == 1 and groups[0][2] == 1
    np.testing.assert_allclose(b, sum(times))


@pytest.mark.slow
def test_rx_sched_main_flow(tmp_path, capsys):
    from dvbs2_tpu.mains import tx as tx_main
    from dvbs2_tpu.mains import rx_sched as rxs_main
    txf = str(tmp_path / "tx.bin")
    snk = str(tmp_path / "sink.out")
    base = ["--mod-cod", "QPSK-S_8/9", "--dec-implem", "MS", "--dec-ite", "2"]
    tx_main.main(base + ["--rad-tx-file-path", txf, "--tx-frames", "16"])
    rxs_main.main(base + ["--rad-rx-file-path", txf, "--rx-frames", "16",
                          "--snk-path", snk, "-m", "18.0",
                          "--sched-r", "4", "--sched-p", "2"])
    out = capsys.readouterr().out
    assert "Scheduler solution" in out
    assert "predicted pipeline throughput" in out
    assert "measured fused-XLA throughput" in out
    assert os.path.getsize(snk) > 0
