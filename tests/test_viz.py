"""Visualization smoke tests: every plotting entry point writes a valid file.

Parity targets: reference viz.py (explode/expand voxel render :28-66, viz_duo
:69-105, animate :107-119, imscatter/tsne_latent :158-181, points :184-233),
eval.py parity plots, loss-curve plots.
"""

import numpy as np
import pytest

from icsg3d_tpu import viz


@pytest.fixture
def grid():
    rng = np.random.default_rng(0)
    g = rng.random((8, 8, 8)).astype(np.float32)
    g[g < 0.7] = 0.0
    return g


def _check(path):
    assert path.exists() and path.stat().st_size > 0


class TestSliceAndPanelPlots:
    def test_plot_slices(self, grid, tmp_path):
        p = tmp_path / "slices.png"
        viz.plot_slices(grid, str(p), n_slices=4)
        _check(p)

    def test_plot_slices_multichannel(self, grid, tmp_path):
        p = tmp_path / "slices_c.png"
        viz.plot_slices(np.stack([grid] * 4, axis=-1), str(p), channel=1)
        _check(p)

    def test_plot_real_vs_pred(self, grid, tmp_path):
        p = tmp_path / "duo.png"
        x = np.stack([grid] * 2, axis=0)[..., None]
        viz.plot_real_vs_pred(x, x * 0.5, str(p))
        _check(p)

    def test_plot_interpolation(self, grid, tmp_path):
        p = tmp_path / "interp.png"
        viz.plot_interpolation(np.stack([grid] * 3, axis=0)[..., None], str(p))
        _check(p)


class TestVoxelRenders:
    def test_plot_voxels_3d(self, grid, tmp_path):
        p = tmp_path / "vox.png"
        viz.plot_voxels_3d(grid, str(p), resample_d=6)
        _check(p)

    def test_plot_voxels_3d_channel_grid(self, grid, tmp_path):
        p = tmp_path / "vox4.png"
        viz.plot_voxels_3d(np.stack([grid] * 4, axis=-1), str(p), resample_d=6)
        _check(p)

    def test_plot_voxels_3d_constant_grid(self, tmp_path):
        # degenerate all-equal grid must not divide by zero
        p = tmp_path / "vox0.png"
        viz.plot_voxels_3d(np.zeros((6, 6, 6)), str(p), resample_d=0)
        _check(p)

    def test_plot_voxels_duo(self, grid, tmp_path):
        p = tmp_path / "voxduo.png"
        viz.plot_voxels_duo(grid, grid * 0.5, str(p), resample_d=6)
        _check(p)

    def test_explode_shape(self):
        data = np.ones((4, 4, 4, 4))
        out = viz._explode(data)
        assert out.shape == (7, 7, 7, 4)
        assert out[::2, ::2, ::2].sum() == data.sum()
        assert out.sum() == data.sum()


class TestAnimation:
    def test_save_slice_animation_single(self, grid, tmp_path):
        p = tmp_path / "anim.gif"
        viz.save_slice_animation(grid, None, str(p))
        _check(p)

    def test_save_slice_animation_pair(self, grid, tmp_path):
        p = tmp_path / "anim2.gif"
        viz.save_slice_animation(
            grid[..., None], (grid > 0).astype(np.float32), str(p), fps=10
        )
        _check(p)


class TestLatentPlots:
    def test_plot_latent_kde(self, tmp_path):
        p = tmp_path / "kde.png"
        viz.plot_latent_kde(np.random.default_rng(0).normal(size=(32, 8)), str(p))
        _check(p)

    def test_plot_latent_tsne(self, tmp_path):
        p = tmp_path / "tsne.png"
        z = np.random.default_rng(0).normal(size=(16, 8))
        viz.plot_latent_tsne(z, str(p), colors=np.arange(16))
        _check(p)

    def test_plot_tsne_thumbnails(self, grid, tmp_path):
        p = tmp_path / "tsne_imgs.png"
        z = np.random.default_rng(0).normal(size=(8, 6))
        imgs = np.stack([np.stack([grid] * 4, axis=-1)] * 8, axis=0)
        viz.plot_tsne_thumbnails(z, imgs, str(p), zoom=2.0)
        _check(p)


class TestScatterAndCurves:
    def test_plot_points_3d(self, tmp_path):
        p = tmp_path / "pts.png"
        labels = np.zeros((8, 8, 8), np.int32)
        labels[2, 3, 4] = 8
        labels[5, 5, 5] = 26
        viz.plot_points_3d(labels, str(p))
        _check(p)

    def test_plot_points_3d_empty(self, tmp_path):
        p = tmp_path / "pts0.png"
        viz.plot_points_3d(np.zeros((8, 8, 8), np.int32), str(p))
        _check(p)

    def test_plot_losses(self, tmp_path):
        p = tmp_path / "loss.png"
        viz.plot_losses([3.0, 2.0, 1.5], [3.2, 2.4, 1.9], str(p))
        _check(p)

    def test_plot_parity(self, tmp_path):
        p = tmp_path / "parity.png"
        t = np.linspace(0, 1, 20)
        viz.plot_parity(t, t + 0.05, str(p), label="a")
        _check(p)
