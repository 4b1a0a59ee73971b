"""File-loaded skybox end-to-end (reference: src/Helper.cs:18-50,
src/MainWindow.cs:177-187, src/Render/Gui.cs:80-87).

Fixture PNGs are generated in-test with the framework's own writer
(tpt.utils.image.write_png), then loaded through the same path a user
takes: load_cubemap_files (sRGB decode, validation) and the viewer's
'e' environment toggle with --cubemap-files.
"""

import os

import numpy as np
import pytest

from tpt.env import load_cubemap_files, srgb_to_linear
from tpt.utils import write_png

pytest.importorskip("PIL", reason="file cubemaps require PIL")

FACE_LEVELS = [10, 60, 110, 160, 210, 255]  # one flat 8-bit level per face


def _write_faces(tmp_path, size=8, levels=FACE_LEVELS):
    paths = []
    for i, lv in enumerate(levels):
        img = np.full((size, size, 3), lv, np.uint8)
        p = os.path.join(tmp_path, f"face{i}.png")
        write_png(p, img)
        paths.append(p)
    return paths


def test_load_cubemap_srgb_decode(tmp_path):
    paths = _write_faces(str(tmp_path))
    faces = np.asarray(load_cubemap_files(paths))
    assert faces.shape == (6, 8, 8, 3)
    # each face is flat: value = srgb_to_linear(level/255), the shader's
    # exact inverse-gamma (compute.glsl:366-369)
    for i, lv in enumerate(FACE_LEVELS):
        want = float(srgb_to_linear(np.float32(lv / 255.0)))
        np.testing.assert_allclose(faces[i], want, rtol=1e-6, atol=1e-6)
    # raw mode skips the decode
    raw = np.asarray(load_cubemap_files(paths, srgb=False))
    np.testing.assert_allclose(raw[5], 1.0, atol=1e-6)


def test_load_cubemap_validation(tmp_path):
    paths = _write_faces(str(tmp_path))
    with pytest.raises(ValueError, match="exactly 6"):
        load_cubemap_files(paths[:5])
    # unequal sizes
    bad = os.path.join(str(tmp_path), "bad.png")
    write_png(bad, np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="disagree in size"):
        load_cubemap_files(paths[:5] + [bad])
    # non-square
    rect = os.path.join(str(tmp_path), "rect.png")
    write_png(rect, np.zeros((4, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="not square"):
        load_cubemap_files(paths[:5] + [rect])


def test_sampling_a_file_cubemap(tmp_path):
    from tpt.env import sample_environment_planar
    paths = _write_faces(str(tmp_path))
    faces = load_cubemap_files(paths)
    # +X direction hits face 0, -Y hits face 3 (GL face order)
    dirs = np.array([[1.0, 0.0], [0.0, -1.0], [0.0, 0.0]], np.float32)
    out = np.asarray(sample_environment_planar(faces, dirs))
    want0 = float(srgb_to_linear(np.float32(FACE_LEVELS[0] / 255.0)))
    want3 = float(srgb_to_linear(np.float32(FACE_LEVELS[3] / 255.0)))
    np.testing.assert_allclose(out[:, 0], want0, rtol=1e-6)
    np.testing.assert_allclose(out[:, 1], want3, rtol=1e-6)


def test_viewer_toggle_uses_file_skybox(tmp_path):
    from tpt.interactive import ViewerSession
    paths = _write_faces(str(tmp_path))
    ses = ViewerSession("cornell", size=16, env_name="atmosphere",
                        atmosphere_size=8, cubemap_files=paths,
                        screenshot_dir=str(tmp_path))
    ses.atmo = type(ses.atmo)(size=8, i_steps=2, j_steps=2)
    assert ses.env_is_atmosphere
    ses.toggle_environment()                       # 'e' (Gui.cs:80-87)
    assert not ses.env_is_atmosphere
    faces = np.asarray(ses.env_faces)
    assert faces.shape == (6, 8, 8, 3)
    want5 = float(srgb_to_linear(np.float32(FACE_LEVELS[5] / 255.0)))
    np.testing.assert_allclose(faces[5], want5, rtol=1e-6)
    # and a frame renders against it
    disp = ses.render_one()
    assert np.isfinite(disp).all()


def test_bundled_skybox_asset_loads():
    # the committed 6-PNG sRGB asset (tpt/assets/EnvironmentMap, generated
    # by tools/make_skybox_asset.py) — the analogue of the reference's
    # res/textures/EnvironmentMap set (src/MainWindow.cs:177-187)
    import os
    import numpy as np
    import tpt.env as env
    d = os.path.join(os.path.dirname(env.__file__), "assets",
                     "EnvironmentMap")
    assert os.path.isdir(d), "bundled skybox asset missing"
    faces = np.asarray(env.bundled_skybox())
    assert faces.ndim == 4 and faces.shape[0] == 6
    assert faces.shape[1] == faces.shape[2] >= 64
    assert np.isfinite(faces).all() and faces.min() >= 0.0
    assert faces.std() > 0.05          # real art, not a constant
    # sRGB was decoded to linear: the linear mean must sit below the
    # encoded mean (gamma expansion darkens mid-tones)
    raw = env.load_cubemap_files(
        [os.path.join(d, f"{n}.png")
         for n in ("posx", "negx", "posy", "negy", "posz", "negz")],
        srgb=False)
    assert float(faces.mean()) < float(np.asarray(raw).mean())
