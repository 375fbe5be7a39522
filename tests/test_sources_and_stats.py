"""Source/sink variants (--src-type, Sink_user_binary equivalents) and the
per-stage observability harness (--sim-stats / --sim-dbg counterparts)."""
import io

import numpy as np
import pytest

from dvbs2_tpu.config import Config
from dvbs2_tpu.io.radio import write_src_file
from dvbs2_tpu.io.sources import (AzcwSource, BinarySink, UserBinarySource,
                                  UserSource, build_source)


def test_azcw_source():
    s = build_source("AZCW", 100)
    assert isinstance(s, AzcwSource)
    b = s.next_batch(3)
    assert b.shape == (3, 100) and not b.any()


def test_rand_source_is_on_device():
    assert build_source("RAND", 100) is None


def test_user_source_cycles(tmp_path):
    path = str(tmp_path / "p.src")
    frames = np.arange(12).reshape(3, 4) % 2
    write_src_file(path, frames)
    s = UserSource(4, path)
    got = s.next_batch(7)           # wraps after 3 frames
    np.testing.assert_array_equal(got[:3], frames)
    np.testing.assert_array_equal(got[3:6], frames)
    np.testing.assert_array_equal(got[6], frames[0])


def test_user_binary_source_unpacks_msb_first(tmp_path):
    path = str(tmp_path / "ts.bin")
    np.array([0b10110000], np.uint8).tofile(path)
    s = UserBinarySource(4, path)
    np.testing.assert_array_equal(s.next_batch(2),
                                  [[1, 0, 1, 1], [0, 0, 0, 0]])


def test_binary_sink_roundtrip(tmp_path):
    path = str(tmp_path / "out.bin")
    bits = np.random.RandomState(0).randint(0, 2, 40).astype(np.int8)
    snk = BinarySink(path)
    snk.send(bits[:13])             # non-byte-aligned chunks carry over
    snk.send(bits[13:])
    snk.close()
    back = np.unpackbits(np.fromfile(path, np.uint8))[:40]
    np.testing.assert_array_equal(back, bits)


def test_unknown_source_rejected():
    with pytest.raises(ValueError):
        build_source("BOGUS", 10)


@pytest.mark.slow
def test_stats_and_debug_run():
    cfg = Config(ldpc_implem="NMS", ldpc_nite=2)
    from dvbs2_tpu.harness import stats
    lines = []
    res = stats.run_stats(cfg, batch=2, ebn0=6.0, reps=2, out=lines.append)
    names = [m for (m, _, _) in res]
    assert names[0] == "source" and "LDPC_decoder" in names
    assert any("PERC" in ln for ln in lines)
    dbg = []
    stats.run_debug(cfg, batch=1, ebn0=6.0, limit=4, out=dbg.append)
    assert any("LDPC_decoder::decode_siho" in ln for ln in dbg)
    assert len(dbg) >= 15
