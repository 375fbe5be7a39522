import numpy as np
import pytest

from dvbs2_tpu.io import native


@pytest.fixture(scope="module")
def dll():
    try:
        return native.load()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build unavailable: {e}")


def test_pack_unpack_roundtrip(dll):
    rng = np.random.RandomState(0)
    bits = rng.randint(0, 2, 1024).astype(np.int8)
    packed = native.pack_bits(bits)
    assert packed.size == 128
    back = native.unpack_bits(packed, 1024)
    np.testing.assert_array_equal(back, bits)
    np.testing.assert_array_equal(packed, np.packbits(bits.astype(np.uint8)))


def test_stream_reader_loop_and_noloop(tmp_path, dll):
    data = np.arange(1000, dtype=np.float32)
    f = str(tmp_path / "iq.bin")
    data.tofile(f)
    s = native.NativeStream(f, capacity_floats=256, loop=True)
    got = s.read(800)  # 1600 floats > file size -> wraps
    assert got.shape == (800, 2)
    np.testing.assert_array_equal(got.reshape(-1)[:1000], data)
    np.testing.assert_array_equal(got.reshape(-1)[1000:1600], data[:600])
    s.close()

    s2 = native.NativeStream(f, capacity_floats=256, loop=False)
    got = s2.read(800)  # wants 1600 floats, file has 1000
    assert got.size == 1000
    s2.close()


def test_native_threaded_radio_matches_file_radio(tmp_path, dll):
    """--rad-threaded path: the native ring-backed radio must deliver the
    same sample stream as FileRadio (reference Radio_USRP threaded-FIFO
    analogue)."""
    from dvbs2_tpu.io.radio import FileRadio, NativeThreadedRadio
    rng = np.random.RandomState(7)
    data = rng.randn(5000, 2).astype(np.float32)
    f = str(tmp_path / "iq.bin")
    data.tofile(f)
    a = FileRadio(f, "r", loop=True)
    b = NativeThreadedRadio(f, loop=True, fifo_bytes=1 << 18)
    for n in (1000, 3000, 2500):
        np.testing.assert_array_equal(a.receive(n), b.receive(n))
    b.close()
