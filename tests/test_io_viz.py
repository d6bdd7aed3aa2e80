"""Image IO round-trips, drawing, native IO runtime, and the demo CLI."""

import os

import numpy as np
import pytest

from cuda_surf_tpu.io import (read_pgm, write_pgm, write_ppm, write_png,
                              imread_gray, read_png_gray)
from cuda_surf_tpu.io import native
from cuda_surf_tpu import viz


def test_pgm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (48, 64), np.uint8)
    p = str(tmp_path / "x.pgm")
    write_pgm(p, img)
    np.testing.assert_array_equal(read_pgm(p), img)


def test_png_roundtrip_gray(tmp_path, rng):
    img = rng.integers(0, 256, (40, 56), np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png_gray(p), img)
    np.testing.assert_array_equal(imread_gray(p), img)


def test_ppm_write(tmp_path, rng):
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    p = str(tmp_path / "x.ppm")
    write_ppm(p, img)
    with open(p, "rb") as f:
        data = f.read()
    assert data.startswith(b"P6\n16 16\n255\n")
    assert data[-16 * 16 * 3:] == img.tobytes()


def test_native_read_matches_python(tmp_path, rng):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    img = rng.integers(0, 256, (33, 47), np.uint8)
    p = str(tmp_path / "n.pgm")
    write_pgm(p, img)
    np.testing.assert_array_equal(native.read_gray(p), img)


def test_native_frame_loader(tmp_path, rng):
    imgs = [rng.integers(0, 256, (24, 32), np.uint8) for _ in range(6)]
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"f{i}.pgm")
        write_pgm(p, im)
        paths.append(p)
    with native.FrameLoader(paths, depth=2) as fl:
        got = list(fl)
    assert len(got) == 6
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)


def test_draw_keypoints_and_matches(small_image):
    import jax
    from cuda_surf_tpu import Surf, SurfConfig

    surf = Surf(SurfConfig(noctaves=2, max_pts=256,
                           candidates_per_octave=512))
    kp1, d1 = surf.detect_and_compute(small_image)
    kp2, d2 = surf.detect_and_compute(small_image)
    m = surf.match(kp1, d1, kp2, d2)
    kp1h = jax.device_get(kp1)
    out = viz.draw_keypoints(small_image, kp1h)
    assert out.shape == small_image.shape + (3,)
    assert out.dtype == np.uint8
    cat = viz.draw_matches(small_image, kp1h, small_image,
                           jax.device_get(kp2), jax.device_get(m))
    assert cat.shape == (small_image.shape[0], 2 * small_image.shape[1], 3)
    # the canvas must differ from the plain image where circles are drawn
    assert (out != viz.to_rgb(small_image)).any()


def test_demo_cli(tmp_path, small_image):
    from cuda_surf_tpu import demo

    p1 = str(tmp_path / "a.pgm")
    p2 = str(tmp_path / "b.pgm")
    write_pgm(p1, small_image)
    write_pgm(p2, small_image)
    demo.main([p1, p2, "--iters", "2", "--octaves", "2",
               "--max-pts", "256", "--out-dir", str(tmp_path)])
    assert os.path.exists(str(tmp_path / "surf_show_matched.ppm"))


def test_plot_trajectories(tmp_path):
    import numpy as np
    from cuda_surf_tpu.viz import plot_trajectories
    from cuda_surf_tpu.io import write_ppm

    th = np.linspace(0, 2 * np.pi, 40)
    gt = np.stack([np.cos(th), np.sin(th), 0 * th], -1)
    vo = gt + 0.03
    canvas = plot_trajectories({"gt": gt, "vo": vo})
    assert canvas.shape == (640, 640, 3)
    # both polylines drawn (white reference + first palette color)
    assert (canvas == 255).all(-1).sum() > 100
    assert ((canvas[..., 0] == 255) & (canvas[..., 1] == 90)).sum() > 100
    write_ppm(str(tmp_path / "traj.ppm"), canvas)
