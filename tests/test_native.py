"""Native IO runtime tests (C++ serde: checked atomic writes, mmap reads,
async thread-pool writes)."""

import os

import numpy as np
import pytest

from noize_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native serde not built and no toolchain"
)

RNG = np.random.default_rng(31)


class TestNativeSerde:
    def test_roundtrip(self, tmp_path):
        a = RNG.normal(size=(257,)).astype(np.float32)
        p = str(tmp_path / "x.data")
        native.write_file(p, a)
        out = native.read_file(p, np.float32)
        np.testing.assert_array_equal(out, a)

    def test_checksum_detects_corruption(self, tmp_path):
        a = np.arange(64, dtype=np.float32)
        p = str(tmp_path / "y.data")
        native.write_file(p, a)
        with open(p, "r+b") as fh:
            fh.seek(40)  # inside the payload
            fh.write(b"\xff\xff\xff\xff")
        with pytest.raises(native.NativeIOError, match="checksum"):
            native.read_file(p, np.float32)

    def test_legacy_raw_file_fallback(self, tmp_path):
        a = np.arange(16, dtype=np.int32)
        p = str(tmp_path / "legacy.data")
        a.tofile(p)  # headerless numpy dump
        out = native.read_file(p, np.int32)
        np.testing.assert_array_equal(out, a)

    def test_async_write_with_ticket(self, tmp_path):
        arrays = [RNG.normal(size=(1000,)).astype(np.float32) for _ in range(6)]
        tickets = [
            native.write_file_async(str(tmp_path / f"a{i}.data"), a)
            for i, a in enumerate(arrays)
        ]
        native.wait(tickets[-1])
        for i, a in enumerate(arrays):
            out = native.read_file(str(tmp_path / f"a{i}.data"), np.float32)
            np.testing.assert_array_equal(out, a)

    def test_atomic_no_tmp_left(self, tmp_path):
        p = str(tmp_path / "z.data")
        native.write_file(p, np.zeros(8, np.float32))
        assert not os.path.exists(p + ".tmp")

    def test_serde_manager_uses_native(self, tmp_path):
        from noize_tpu.core.serde import SerdeManager

        sd = SerdeManager(str(tmp_path), "n", "1")
        a = RNG.normal(size=(9, 9)).astype(np.float32)
        sd.save("buf", a)
        # native header magic present
        with open(sd._path_for("buf"), "rb") as fh:
            assert fh.read(8)[:5] != a.tobytes()[:5]
        out = sd.load("buf")
        np.testing.assert_array_equal(out, a)

    def test_numpy_fallback_reads_native_format(self, tmp_path):
        """A checkpoint written by the C++ pool must restore on a machine
        WITHOUT the toolchain (ADVICE r1: header-aware NumPy fallback)."""
        from noize_tpu.core.serde import _numpy_read

        a = RNG.normal(size=(33, 7)).astype(np.float32)
        p = str(tmp_path / "native.data")
        native.write_file(p, a)
        flat = _numpy_read(p, np.float32)
        np.testing.assert_array_equal(flat, a.ravel())
        # and a legacy raw dump still reads
        p2 = str(tmp_path / "raw.data")
        a.tofile(p2)
        np.testing.assert_array_equal(_numpy_read(p2, np.float32), a.ravel())

    def test_wait_specific_ticket(self, tmp_path):
        """Wait(t) must not return before ticket t itself retires, even
        with out-of-order retirement across the 2 workers (ADVICE r1)."""
        arrays = [RNG.normal(size=(4096,)).astype(np.float32)
                  for _ in range(16)]
        tickets = [
            native.write_file_async(str(tmp_path / f"w{i}.data"), a)
            for i, a in enumerate(arrays)
        ]
        for i, t in enumerate(tickets):
            native.wait(t)
            out = native.read_file(str(tmp_path / f"w{i}.data"), np.float32)
            np.testing.assert_array_equal(out, arrays[i])
        native.wait(0)


def test_numpy_fallback_rejects_corrupt_payload(tmp_path):
    """The no-toolchain fallback must verify the NZTFU FNV-1a checksum —
    a bit-flipped checkpoint fails loudly on EVERY machine (ADVICE r1)."""
    import pytest
    from noize_tpu import native
    from noize_tpu.core.serde import _numpy_read

    if not native.available():
        pytest.skip("native writer unavailable")
    a = np.arange(64, dtype=np.float32)
    p = str(tmp_path / "c.data")
    native.write_file(p, a)
    good = _numpy_read(p, np.float32)
    np.testing.assert_array_equal(good, a)
    raw = bytearray(open(p, "rb").read())
    raw[40] ^= 0x10  # flip a payload bit past the 32-byte header
    open(p, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        _numpy_read(p, np.float32)
