"""Point-splatting synthetic renderer (tools/point_splat.py) vs the
reference `rendering/render_trimesh.py:74-353` contract.

The z-buffer oracle below is a literal sequential reimplementation of the
reference's per-point update loop (:240-262: strict `z < buffer[pixel]`
test, so ties keep the EARLIEST point) — the vectorized lexsort splat must
match it exactly, including on manufactured z-ties."""

import os

import numpy as np
import pytest

from nerface_tpu.tools.point_splat import (
    look_at_splat,
    normalize_for_splat,
    project_and_splat,
    ritter_bounding_sphere,
    splat_dataset,
    splat_intrinsics_hom,
)


def _loop_splat_oracle(c2w, intr_hom, verts, im_size, coords_space="world"):
    """Sequential z-buffer exactly as `project_world_to_image_torch`
    (`render_trimesh.py:197-267`) runs it, minus its cam-space masking
    no-op bug (point_splat.py module docstring)."""
    verts_hom = np.concatenate([verts, np.ones((len(verts), 1))], 1)
    proj = (intr_hom @ np.linalg.inv(c2w) @ verts_hom.T).T
    cam_space = proj.copy()
    z = proj[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        pp = proj / z[:, None]
    m1 = ~np.isnan(pp[:, 2])
    pp = np.rint(pp[m1])
    z1 = z[m1]
    m2 = (
        (pp[:, 0] >= 0) & (pp[:, 0] < im_size)
        & (pp[:, 1] >= 0) & (pp[:, 1] < im_size)
    )
    pix = pp[m2, :2].astype(int)
    zv = z1[m2]
    src = (verts[m1][m2] if coords_space == "world"
           else cam_space[m1][m2][:, :3])

    result = np.full((im_size, im_size), np.inf)
    coords = np.full((im_size, im_size, 3), -1.0)
    vids = np.zeros((im_size, im_size))
    for p in range(len(pix)):
        if zv[p] < result[pix[p, 0], pix[p, 1]]:
            result[pix[p, 0], pix[p, 1]] = zv[p]
            coords[pix[p, 0], pix[p, 1]] = src[p]
            vids[pix[p, 0], pix[p, 1]] = p + 1
    result[np.isinf(result)] = 0.0
    result = np.abs(result)
    mx = result.max()
    depth_u8 = (result / mx * 255).astype(np.uint8) if mx > 0 else \
        result.astype(np.uint8)
    return depth_u8, coords, vids


@pytest.mark.parametrize("coords_space", ["world", "cam"])
def test_splat_matches_sequential_oracle(coords_space):
    rng = np.random.RandomState(0)
    verts = rng.randn(500, 3) * 0.3
    # manufacture z-ties: duplicate some points exactly (same pixel AND
    # same z) plus same-pixel different-z collisions via tight clusters
    verts = np.concatenate([verts, verts[:50], verts[:20] + 1e-9], 0)
    c2w = look_at_splat(np.array([0.4, 0.3, 0.9]), np.zeros(3))
    intr = splat_intrinsics_hom(32)
    got = project_and_splat(c2w, intr, verts, 32, coords_space=coords_space)
    want = _loop_splat_oracle(c2w, intr, verts, 32, coords_space=coords_space)
    np.testing.assert_array_equal(got[0], want[0])  # depth u8
    np.testing.assert_allclose(got[1], want[1], atol=1e-12)  # coords
    np.testing.assert_array_equal(got[2], want[2])  # vert ids (tie order)


def test_lookat_reference_convention():
    cam = np.array([0.3, -0.2, 0.8])
    c2w = look_at_splat(cam, np.zeros(3))
    # translation column carries the camera position
    np.testing.assert_allclose(c2w[:3, 3], cam, atol=1e-12)
    # third basis column = normalize(cam - target): OpenGL forward (+z
    # away from the scene)
    np.testing.assert_allclose(
        c2w[:3, 2], cam / np.linalg.norm(cam), atol=1e-12
    )
    # orthonormal rotation
    np.testing.assert_allclose(
        c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-12
    )


def test_ritter_sphere_encloses():
    rng = np.random.RandomState(3)
    pts = rng.randn(400, 3) * np.array([2.0, 0.5, 1.0])
    c, r = ritter_bounding_sphere(pts)
    d = np.linalg.norm(pts - c, axis=1)
    assert (d <= r + 1e-9).all()
    # not wildly loose: within 25% of the max-pairwise-distance/2 bound
    lo = d.max()
    assert r <= 1.25 * lo


def test_normalize_for_splat_unit_scale():
    rng = np.random.RandomState(4)
    v = rng.randn(200, 3) * 5 + 10
    n = normalize_for_splat(v)
    _, r = ritter_bounding_sphere(n)
    # scaled by 1/(2 radius): normalized cloud fits in a ~0.5 sphere
    assert 0.3 < r <= 0.55


def _write_tetra_off(path):
    # 4 tetra corners + interior points near the centroid, so every pose
    # keeps some points inside the reference's fixed-200px-focal frame
    # (corner-only clouds can project entirely out of frame — a faithful
    # reproduction of `camera_intrinsics_1_hom`'s im_size-independent focal)
    rng = np.random.RandomState(7)
    interior = 0.25 + 0.12 * rng.randn(36, 3)
    verts = np.concatenate(
        [np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float),
         interior]
    )
    with open(path, "w") as f:
        f.write(f"OFF\n{len(verts)} 4 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write("3 0 1 2\n3 0 1 3\n3 0 2 3\n3 1 2 3\n")


def test_splat_dataset_layout(tmp_path):
    mesh = str(tmp_path / "tetra.off")
    _write_tetra_off(mesh)
    out = str(tmp_path / "out")
    counts = splat_dataset(mesh, out, n_views_train=3, n_views_test=2,
                           im_size=256, render_color=True, log=False)
    assert counts == {"train": 3, "test": 2}
    assert sorted(os.listdir(os.path.join(out, "train", "A"))) == [
        "pose_0.npy", "pose_1.npy", "pose_2.npy"
    ]
    assert sorted(os.listdir(os.path.join(out, "test", "A"))) == [
        "pose_0.npy", "pose_1.npy"
    ]
    a = np.load(os.path.join(out, "train", "A", "pose_0.npy"))
    assert a.shape == (256, 256, 4)
    # occupied pixels carry 1-based ids, empty carry 0 and coords -1
    vids = a[..., 3]
    assert (vids >= 0).all() and vids.max() >= 1
    empty = vids == 0
    assert (a[..., :3][empty] == -1).all()
    # the tetra visibly splats from every pose
    for i in range(3):
        ai = np.load(os.path.join(out, "train", "A", f"pose_{i}.npy"))
        assert (ai[..., 3] > 0).sum() > 0
    assert os.path.exists(os.path.join(out, "depth", "depth_0.png"))
    assert os.path.exists(os.path.join(out, "poses_train.npy"))
    assert np.load(os.path.join(out, "poses_test.npy")).shape == (2, 3)
    # color side rendered something non-empty
    from PIL import Image

    b = np.asarray(Image.open(os.path.join(out, "train", "B", "pose_0.png")))
    assert b.shape[:2] == (256, 256) and b[..., :3].max() > 0


def test_generate_synthetic_cli_splat(tmp_path):
    from nerface_tpu.cli.generate_synthetic import main

    mesh = str(tmp_path / "tetra.off")
    _write_tetra_off(mesh)
    out = str(tmp_path / "cli_out")
    main(["--target", out, "--mesh", mesh, "--splat",
          "--n-train", "2", "--n-test", "1", "--size", "256"])
    assert os.path.exists(os.path.join(out, "train", "A", "pose_1.npy"))
    assert os.path.exists(os.path.join(out, "test", "A", "pose_0.npy"))
