"""Native C++ decode core vs the pure-Python readers (bit-level parity)."""

import os

import numpy as np
import pytest

from ganet_tpu.data import native_io
from ganet_tpu.data.dataset import StereoDataset, normalize_image
from ganet_tpu.data.pfm import write_pfm

pytestmark = pytest.mark.skipif(
    not native_io.native_available(), reason="native io library unavailable"
)


def _make_tree(tmp_path, rng, H=64, W=80, n=2):
    from PIL import Image

    root = tmp_path / "sf"
    ldir = root / "frames_finalpass/TRAIN/A/0000/left"
    rdir = root / "frames_finalpass/TRAIN/A/0000/right"
    ddir = root / "disparity/TRAIN/A/0000/left"
    for d in (ldir, rdir, ddir):
        os.makedirs(d)
    for i in range(n):
        for d in (ldir, rdir):
            arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"{i:04d}.png"))
        write_pfm(
            str(ddir / f"{i:04d}.pfm"),
            (rng.random((H, W)) * 30 - 5).astype(np.float32),
        )
    lst = tmp_path / "train.list"
    lst.write_text(
        "\n".join(
            f"frames_finalpass/TRAIN/A/0000/left/{i:04d}.png" for i in range(n)
        )
    )
    return str(root), str(lst)


class TestNativeDecodeParity:
    def test_train_crop_matches_python(self, tmp_path, rng):
        root, lst = _make_tree(tmp_path, rng)
        kw = dict(
            data_path=root, list_path=lst, crop_height=48, crop_width=48,
            kind="sceneflow", training=True, max_disp=192, seed=7,
        )
        ds_native = StereoDataset(use_native=True, **kw)
        ds_python = StereoDataset(use_native=False, **kw)
        a, b = ds_native[0], ds_python[0]
        for k in ("left", "right", "disparity", "valid"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_pad_mode_matches_python(self, tmp_path, rng):
        root, lst = _make_tree(tmp_path, rng, H=40, W=50)
        kw = dict(
            data_path=root, list_path=lst, crop_height=48, crop_width=96,
            kind="sceneflow", training=False, max_disp=192,
        )
        a = StereoDataset(use_native=True, **kw)[0]
        b = StereoDataset(use_native=False, **kw)[0]
        for k in ("left", "right", "disparity", "valid"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_kitti_png16(self, tmp_path, rng):
        from ganet_tpu.data.kitti_io import write_disparity_png
        from PIL import Image

        root = tmp_path / "k"
        for sub in ("image_2", "image_3", "disp_occ_0"):
            os.makedirs(root / sub)
        H, W = 52, 60
        for sub in ("image_2", "image_3"):
            arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(root / sub / "000000_10.png"))
        disp = (rng.random((H, W)) * 90).astype(np.float32)
        write_disparity_png(str(root / "disp_occ_0" / "000000_10.png"), disp)
        lst = tmp_path / "k.list"
        lst.write_text("000000_10.png\n")
        kw = dict(
            data_path=str(root), list_path=str(lst), crop_height=48,
            crop_width=48, kind="kitti2015", training=True, max_disp=192,
            seed=3,
        )
        a = StereoDataset(use_native=True, **kw)[0]
        b = StereoDataset(use_native=False, **kw)[0]
        for k in ("left", "right", "disparity", "valid"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)

    def test_batch_decode_threads(self, tmp_path, rng):
        root, lst = _make_tree(tmp_path, rng, n=4)
        from ganet_tpu.data.lists import derive_paths, read_list

        entries = read_list(lst)
        paths = [derive_paths(root, e, "sceneflow") for e in entries * 2]
        out = native_io.decode_batch(
            [p.left for p in paths],
            [p.right for p in paths],
            [p.disparity for p in paths],
            disp_is_pfm=True,
            crop_h=32, crop_w=32,
            crop_ys=[0] * len(paths), crop_xs=[1] * len(paths),
            num_threads=2,
        )
        assert out["left"].shape == (8, 32, 32, 3)
        # same file decoded twice -> identical rows
        np.testing.assert_array_equal(out["left"][0], out["left"][4])

    def test_missing_file_errors(self, tmp_path):
        with pytest.raises(IOError):
            native_io.decode_sample(
                "/nonexistent/l.png", "/nonexistent/r.png", "/nonexistent/d.pfm",
                True, 8, 8, 0, 0,
            )
