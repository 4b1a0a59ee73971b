"""Native C++ component parity tests (std140, PCG, PNG)."""

import os
import struct
import zlib

import numpy as np
import pytest

from tpt import native_bridge
from tpt.rng import np_pcg_hash
from tpt.scene import demo_scene, pack_std140


requires_native = pytest.mark.skipif(not native_bridge.native_available(),
                                     reason="native toolchain unavailable")


@requires_native
def test_std140_native_matches_python():
    scene = demo_scene().build()
    native = native_bridge.pack_std140_native(scene)
    python = pack_std140(scene)
    np.testing.assert_array_equal(native, python)

    spheres, smats, cmin, cmax, cmats = native_bridge.unpack_std140_native(native)
    np.testing.assert_array_equal(spheres, np.asarray(scene.sphere_pos_radius))
    np.testing.assert_array_equal(smats, np.asarray(scene.sphere_material))
    np.testing.assert_array_equal(cmin, np.asarray(scene.cuboid_min))
    np.testing.assert_array_equal(cmax, np.asarray(scene.cuboid_max))
    np.testing.assert_array_equal(cmats, np.asarray(scene.cuboid_material))


@requires_native
def test_pcg_native_bit_parity():
    for seed in [1, 12345, 0xDEADBEEF]:
        native = native_bridge.pcg_floats_native(seed, 64)
        s = seed
        expected = []
        for _ in range(64):
            word, s = np_pcg_hash(s)
            expected.append(np.float32(np.float32(word) / np.float32(2**32)))
        np.testing.assert_array_equal(native, np.array(expected, np.float32))


@requires_native
def test_png_native_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    path = str(tmp_path / "out.png")
    native_bridge.write_png_native(path, img)

    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (9, 12)
    # decode the IDAT and verify pixels (vertical flip applied by writer)
    idat_ofs = data.index(b"IDAT")
    idat_len = struct.unpack(">I", data[idat_ofs - 4:idat_ofs])[0]
    raw = zlib.decompress(data[idat_ofs + 4: idat_ofs + 4 + idat_len])
    rows = np.frombuffer(raw, np.uint8).reshape(12, 1 + 9 * 3)
    assert (rows[:, 0] == 0).all()  # filter byte: none
    decoded = rows[:, 1:].reshape(12, 9, 3)
    np.testing.assert_array_equal(decoded, img[::-1])


@requires_native
def test_png_native_matches_python_writer(tmp_path):
    from tpt.utils.image import write_png
    img = np.linspace(0, 1, 8 * 6 * 3, dtype=np.float32).reshape(8, 6, 3)
    p1 = str(tmp_path / "native.png")
    p2 = str(tmp_path / "python.png")
    native_bridge.write_png_native(p1, img)
    write_png(p2, img)

    def decode(path):
        data = open(path, "rb").read()
        idat_ofs = data.index(b"IDAT")
        idat_len = struct.unpack(">I", data[idat_ofs - 4:idat_ofs])[0]
        return zlib.decompress(data[idat_ofs + 4: idat_ofs + 4 + idat_len])

    assert decode(p1) == decode(p2)
