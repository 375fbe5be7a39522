"""factory::Radio dispatch surface (reference:
src/common/Factory/Module/Radio/Radio.cpp:27-51,116-126): --rad-type
{USER_BIN, USRP, NO} with the full USRP parameter set parsed, USRP gated
behind a clear hardware-unavailable error, NO a true null radio."""
import numpy as np
import pytest

from dvbs2_tpu import cli
from dvbs2_tpu.io import radio as rad


def _args(extra):
    p = cli.build_parser("t")
    return p.parse_args(extra)


def test_usrp_args_parse_with_reference_defaults():
    a = _args(["--rad-type", "USRP", "--rad-rx-rate", "8e6",
               "--rad-rx-freq", "1.2e9", "--rad-usrp-type", "b200",
               "--rad-ip-addr", "10.0.0.7"])
    assert a.rad_type == "USRP"
    assert a.rad_rx_rate == 8e6 and a.rad_rx_freq == 1.2e9
    assert a.rad_rx_ant == "RX2" and a.rad_tx_ant == "TX/RX"  # ref defaults
    assert a.rad_rx_gain == 10.0 and a.rad_clk_rate == pytest.approx(
        33.333333e6)


def test_usrp_open_raises_clear_error_without_uhd():
    a = _args(["--rad-type", "USRP", "--rad-rx-rate", "8e6"])
    with pytest.raises(RuntimeError, match="UHD"):
        rad.open_rx_radio(a)
    with pytest.raises(RuntimeError, match="UHD"):
        rad.open_tx_radio(a)


def test_usrp_rejects_unknown_params():
    with pytest.raises(ValueError, match="unknown"):
        rad.RadioUSRP(rad_bogus=1)


def test_null_radio_roundtrip():
    a = _args(["--rad-type", "NO"])
    r = rad.open_rx_radio(a)
    blk = r.receive(64)
    assert blk.shape == (64, 2) and blk.dtype == np.float32
    assert not blk.any()
    t = rad.open_tx_radio(a)
    t.send(np.ones((8, 2), np.float32))  # no-op, must not raise
    r.close(), t.close()


def test_user_bin_dispatch_unchanged(tmp_path):
    f = tmp_path / "iq.bin"
    data = np.arange(20, dtype=np.float32)
    data.tofile(f)
    a = _args(["--rad-rx-file-path", str(f)])
    r = rad.open_rx_radio(a)
    assert isinstance(r, rad.FileRadio)
    np.testing.assert_array_equal(r.receive(3),
                                  data.reshape(-1, 2)[:3])
