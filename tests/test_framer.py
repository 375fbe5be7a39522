import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2_tpu.config import Config, M_SLOT
from dvbs2_tpu.ops import cplx, framer


@pytest.mark.parametrize("modcod", ["QPSK-S_8/9", "8PSK-S_8/9", "16APSK-S_8/9"])
def test_frame_deframe_roundtrip(modcod):
    cfg = Config(modcod=modcod)
    rng = np.random.RandomState(0)
    x = cplx.from_np(rng.randn(2, cfg.N_xfec_frame)
                     + 1j * rng.randn(2, cfg.N_xfec_frame))
    pl = framer.frame(jnp.asarray(x), modcod)
    assert pl.shape == (2, cfg.pl_frame_size, 2)
    back = framer.deframe(pl, modcod)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_plh_structure():
    plh = framer.plheader("QPSK-S_8/9")
    assert plh.shape == (90,)
    # all pi/2-BPSK symbols have unit energy
    np.testing.assert_allclose(np.abs(plh), 1.0, rtol=1e-6)
    # SOF first symbol: bit 0 -> +(1+j)/sqrt(2)
    np.testing.assert_allclose(plh[0], (1 + 1j) / np.sqrt(2), rtol=1e-6)
    # second SOF bit is 1, odd symbol: -(-1+j)/sqrt(2) sign flip
    np.testing.assert_allclose(plh[1], (1 - 1j) / np.sqrt(2), rtol=1e-6)


def test_pilots_and_geometry():
    cfg = Config(modcod="QPSK-S_8/9")
    assert cfg.pl_frame_size == 8370 and cfg.n_pilots == 5
    tmpl = framer._frame_template("QPSK-S_8/9")
    pilot = (1 + 1j) / np.sqrt(2)
    # first pilot block right after PLH + 16 slots
    start = M_SLOT + 16 * M_SLOT
    np.testing.assert_allclose(tmpl[start:start + 36], pilot, rtol=1e-6)
    # pilot count: 5 blocks x 36 symbols
    n_pilot_syms = np.sum(np.isclose(tmpl.real, pilot.real)
                          & np.isclose(tmpl.imag, pilot.imag))
    assert n_pilot_syms >= 5 * 36


@pytest.mark.parametrize("modcod,pl_size", [
    ("QPSK-S_8/9", 8370), ("QPSK-S_3/5", 8370), ("8PSK-S_3/5", 5598),
    ("8PSK-S_8/9", 5598), ("16APSK-S_8/9", 4212)])
def test_frame_sizes_match_survey(modcod, pl_size):
    assert Config(modcod=modcod).pl_frame_size == pl_size
