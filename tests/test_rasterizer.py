"""Software rasterizer (tools/rasterizer.py) and bbox-pipeline parity.

The reference detects head bboxes by thresholding a pyrender offscreen
render of the mean face (`real_to_nerf.py:125-238`); the dataset builder
here projects the mesh VERTICES instead (`tools/dataset_builder.mesh_bbox`).
Perspective projection maps triangles to triangles, so inside the viewport
the two pipelines must agree to pixel discretization — these tests pin
that delta (≤2 px at 512²) over a pose sweep, including partially
offscreen poses where viewport clipping must happen BEFORE the
enlargement ratios.
"""

import os

import numpy as np
import pytest

MESH = "/root/reference/nerface_code/nerf-pytorch/average.off"

if not os.path.exists(MESH):  # pragma: no cover
    pytest.skip("reference mean-face mesh unavailable", allow_module_level=True)

from nerface_tpu.tools.dataset_builder import find_bbox, mesh_bbox  # noqa: E402
from nerface_tpu.tools.rasterizer import (  # noqa: E402
    load_off_mesh,
    rasterize_mesh,
    render_mask_image,
)


@pytest.fixture(scope="module")
def mesh():
    verts, faces = load_off_mesh(MESH)
    assert verts.shape[0] == 53490 and faces.shape[0] == 106466
    return verts, faces


def _pose(rng, z):
    from nerface_tpu.utils.lie import so3_exp
    import jax.numpy as jnp

    pose = np.eye(4)
    pose[:3, :3] = np.asarray(so3_exp(jnp.asarray(rng.randn(3) * 0.1)))
    pose[:3, 3] = [rng.randn() * 0.02, rng.randn() * 0.02, z]
    return pose


INTR = np.array([1200.0, 1200.0, 256.0, 256.0])


class TestBBoxParity:
    @pytest.mark.parametrize("z,seed", [(0.8, 0), (1.1, 1), (0.35, 2)],
                             ids=["near", "far", "clipped"])
    def test_vertex_bbox_matches_rasterized_mask_bbox(self, mesh, z, seed):
        verts, faces = mesh
        pose = _pose(np.random.RandomState(seed), z)
        img = render_mask_image(verts, faces, pose, INTR)
        assert (img[..., 0] < 255).sum() > 1000, "head not in frame"
        bbox_raster = find_bbox(img)          # reference pipeline semantics
        bbox_vertex = mesh_bbox(verts, pose, INTR)
        delta_px = np.abs(bbox_raster - bbox_vertex).max() * 512
        assert delta_px <= 2.0, (bbox_raster, bbox_vertex, delta_px)


class TestRasterizer:
    def test_depth_buffer_sane(self, mesh):
        verts, faces = mesh
        pose = _pose(np.random.RandomState(3), 0.9)
        depth, mask = rasterize_mesh(verts, faces, pose, INTR)
        assert mask.any()
        d = depth[mask]
        # the face sits ~0.9 in front of the camera
        assert 0.5 < float(d.min()) < 1.3
        assert float(d.max()) < 1.5
        # background is +inf
        assert np.isinf(depth[~mask]).all()

    def test_mask_image_contract(self, mesh):
        """White background; head pixels strictly non-white in channel 0 —
        the exact property `find_bbox` thresholds (`real_to_nerf.py:216`)."""
        verts, faces = mesh
        pose = _pose(np.random.RandomState(4), 0.9)
        img = render_mask_image(verts, faces, pose, INTR)
        _, mask = rasterize_mesh(verts, faces, pose, INTR)
        assert (img[~mask] == 255).all()
        assert (img[mask][:, 0] < 255).all()

    def test_offscreen_face_empty(self, mesh):
        verts, faces = mesh
        pose = np.eye(4)
        pose[:3, 3] = [10.0, 0.0, 0.9]  # way off to the side
        depth, mask = rasterize_mesh(verts, faces, pose, INTR)
        assert not mask.any()
