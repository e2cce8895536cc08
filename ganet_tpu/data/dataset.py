"""Stereo datasets: SceneFlow / KITTI from disk, plus a synthetic generator.

Reference: `DatasetFromList` and the `get_training_set` / `get_test_set`
factories in dataloader/dataset.py + dataloader/data.py (SURVEY.md §2
#9-#10):

  * training: random crop to (crop_height, crop_width), per-channel
    normalize; ground-truth disparity cropped identically;
  * test: pad (top/right) up to the crop size instead of cropping, so
    predictions can be unpadded back to the original frame;
  * valid-pixel mask: 0 < gt < max_disp (KITTI 0 = no ground truth).

A sample is a dict of float32 numpy arrays:
  left, right: (H, W, 3) normalized images
  disparity:   (H, W)
  valid:       (H, W) float mask

The synthetic dataset renders random textured fronto-parallel layers with
known disparity — used by tests, the benchmark, and BASELINE.json config
#1; it exercises the exact geometry convention of the cost volume
(right[w] = left[w + d]).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from ganet_tpu.data import kitti_io, pfm
from ganet_tpu.data.lists import derive_paths, read_list

# Per-channel normalization constants (ImageNet statistics — the reference
# normalizes with fixed per-channel mean/std in dataloader/dataset.py).
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8-range (H, W, 3) -> normalized float32."""
    return (img.astype(np.float32) / 255.0 - MEAN) / STD


def _random_crop(
    arrays: Tuple[np.ndarray, ...], ch: int, cw: int, rng: np.random.Generator
) -> Tuple[np.ndarray, ...]:
    H, W = arrays[0].shape[:2]
    if H < ch or W < cw:
        # Pad reflect-free (zeros) up to crop size first.
        padded = []
        for a in arrays:
            pad = [(max(ch - H, 0), 0), (0, max(cw - W, 0))] + [(0, 0)] * (
                a.ndim - 2
            )
            padded.append(np.pad(a, pad))
        arrays = tuple(padded)
        H, W = arrays[0].shape[:2]
    y = int(rng.integers(0, H - ch + 1))
    x = int(rng.integers(0, W - cw + 1))
    return tuple(a[y : y + ch, x : x + cw] for a in arrays)


def _pad_to(arrays: Tuple[np.ndarray, ...], ch: int, cw: int):
    """Pad on top and right, as the reference's test transform does, so the
    bottom-left origin of the frame is preserved."""
    H, W = arrays[0].shape[:2]
    if H > ch or W > cw:
        raise ValueError(f"image {H}x{W} larger than pad target {ch}x{cw}")
    out = []
    for a in arrays:
        pad = [(ch - H, 0), (0, cw - W)] + [(0, 0)] * (a.ndim - 2)
        out.append(np.pad(a, pad))
    return tuple(out)


@dataclasses.dataclass
class StereoDataset:
    """List-file-backed dataset (SceneFlow / KITTI)."""

    data_path: str
    list_path: str
    crop_height: int
    crop_width: int
    kind: str = "sceneflow"  # sceneflow | kitti2012 | kitti2015
    training: bool = True
    max_disp: int = 192
    seed: int = 0
    # Also return the right-view ground truth as disparity_right /
    # valid_right (reference --left_right; dataloader/dataset.py returns
    # right-view GT when set — SURVEY.md §2 #9).  SceneFlow only.
    left_right: bool = False
    # Decode in the native C++ core (native/ganet_io.cpp) when available;
    # falls back to the pure-Python readers transparently.
    use_native: bool = True

    def __post_init__(self):
        self.entries = read_list(self.list_path)
        self._rng = np.random.default_rng(self.seed)
        self._size_cache = {}
        if self.left_right and self.kind != "sceneflow":
            raise ValueError(
                "left_right requires right-view ground truth, which only"
                " SceneFlow provides (KITTI publishes left-view GT only)"
            )

    def _native_item(self, index: int, paths):
        from ganet_tpu.data import native_io

        if not native_io.native_available():
            return None
        size = self._size_cache.get(index)
        if size is None:
            from PIL import Image

            with Image.open(paths.left) as im:
                size = (im.height, im.width)
            self._size_cache[index] = size
        H, W = size
        if self.training:
            if H < self.crop_height or W < self.crop_width:
                return None  # python path handles pad-then-crop
            y = int(self._rng.integers(0, H - self.crop_height + 1))
            x = int(self._rng.integers(0, W - self.crop_width + 1))
        else:
            if H > self.crop_height or W > self.crop_width:
                raise ValueError(
                    f"image {H}x{W} larger than pad target "
                    f"{self.crop_height}x{self.crop_width}"
                )
            y = x = -1  # pad mode
        sample = native_io.decode_sample(
            paths.left,
            paths.right,
            paths.disparity,
            disp_is_pfm=(self.kind == "sceneflow"),
            crop_h=self.crop_height,
            crop_w=self.crop_width,
            crop_y=y,
            crop_x=x,
        )
        disp = sample["disparity"]
        sample["valid"] = (
            (disp > 0) & (disp < self.max_disp)
        ).astype(np.float32)
        return sample

    def __len__(self) -> int:
        return len(self.entries)

    def original_size(self, index: int) -> Tuple[int, int]:
        paths = derive_paths(self.data_path, self.entries[index], self.kind)
        img = kitti_io.read_image(paths.left)
        return img.shape[0], img.shape[1]

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        paths = derive_paths(self.data_path, self.entries[index], self.kind)
        if self.use_native and not self.left_right:
            try:
                sample = self._native_item(index, paths)
            except IOError:
                sample = None  # corrupt/unsupported file: python fallback
            if sample is not None:
                return sample
        left = kitti_io.read_image(paths.left)
        right = kitti_io.read_image(paths.right)

        def read_disp(path):
            if self.kind == "sceneflow":
                d = pfm.read_pfm(path)
                if d.ndim == 3:
                    d = d[..., 0]
                return np.abs(d)  # SceneFlow signs disparity by view
            return kitti_io.read_disparity_png(path)

        disp = read_disp(paths.disparity)
        arrays = [normalize_image(left), normalize_image(right), disp]
        if self.left_right:
            arrays.append(read_disp(paths.disparity_right))
        if self.training:
            arrays = _random_crop(
                tuple(arrays), self.crop_height, self.crop_width, self._rng
            )
        else:
            arrays = _pad_to(tuple(arrays), self.crop_height, self.crop_width)
        left, right, disp = arrays[:3]
        valid = ((disp > 0) & (disp < self.max_disp)).astype(np.float32)
        sample = {
            "left": left.astype(np.float32),
            "right": right.astype(np.float32),
            "disparity": disp.astype(np.float32),
            "valid": valid,
        }
        if self.left_right:
            disp_r = arrays[3]
            sample["disparity_right"] = disp_r.astype(np.float32)
            sample["valid_right"] = (
                (disp_r > 0) & (disp_r < self.max_disp)
            ).astype(np.float32)
        return sample


@dataclasses.dataclass
class SyntheticStereoDataset:
    """Procedural stereo pairs with exact ground truth.

    Each scene: a background plane plus `num_layers` rectangular layers at
    increasing disparities; right view is generated by shifting each layer
    left by its disparity (right[w] = left[w + d]).  Occluded background is
    filled with the nearest layer; ground truth is the left-view disparity.
    """

    crop_height: int = 48
    crop_width: int = 96
    max_disp: int = 24
    length: int = 64
    num_layers: int = 3
    seed: int = 0
    training: bool = True
    left_right: bool = False  # also emit right-view GT (see StereoDataset)
    # KITTI-LiDAR-like sparse supervision (reference --kitti2015 fine-tune,
    # SURVEY.md §3.5: KITTI GT covers ~30% of pixels, none in the upper
    # frame where LiDAR has no returns).  0 = dense GT; >0 thins the valid
    # mask to ≈ this fraction with a scanline-band pattern.
    sparse_frac: float = 0.0

    def __len__(self) -> int:
        return self.length

    def _lidar_mask(self, rng, H: int, W: int) -> "np.ndarray":
        """KITTI-like sparse-GT mask at ≈ sparse_frac coverage: the top
        ~30% of the frame has no returns, the rest is scanline bands
        (every other row) with per-pixel dropout."""
        top = int(H * 0.3)
        band = np.zeros((H, W), np.float32)
        band[top::2] = 1.0  # scanline rows
        band_frac = band.mean()
        p = min(1.0, self.sparse_frac / max(band_frac, 1e-6))
        return band * (rng.random((H, W)) < p).astype(np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        H, W = self.crop_height, self.crop_width
        Dmax = int(self.max_disp * 0.8)
        pad = self.max_disp  # extra width so shifts stay textured

        def texture():
            # Smooth random texture: low-res noise upsampled (keeps local
            # matching unambiguous but non-trivial).
            base = rng.standard_normal((H // 4 + 2, (W + pad) // 4 + 2, 3))
            t = np.kron(base, np.ones((4, 4, 1)))[: H, : W + pad]
            t = t + 0.05 * rng.standard_normal((H, W + pad, 3))
            return t.astype(np.float32)

        wide_left = texture()
        disp_wide = np.full((H, W + pad), float(rng.integers(1, max(2, Dmax // 4))), np.float32)
        for _ in range(self.num_layers):
            d = float(rng.integers(1, max(2, Dmax)))
            y0 = int(rng.integers(0, H // 2))
            x0 = int(rng.integers(0, (W + pad) // 2))
            h = int(rng.integers(H // 4, H // 2 + 1))
            w = int(rng.integers(W // 4, W // 2 + 1))
            patch_tex = texture()
            region = (slice(y0, min(y0 + h, H)), slice(x0, min(x0 + w, W + pad)))
            # nearer layers (larger d) overwrite
            mask = disp_wide[region] < d
            disp_wide[region][mask] = d
            wide_left[region][mask] = patch_tex[region][mask]

        # Right view: sample left at w + d (per-pixel disparity of the left
        # view; fine for fronto-parallel layers).
        xs = np.arange(W)
        right = np.empty((H, W, 3), np.float32)
        for y in range(H):
            src = np.clip(xs + disp_wide[y, :W].astype(np.int32), 0, W + pad - 1)
            right[y] = wide_left[y, src]
        left = wide_left[:, :W]
        disp = disp_wide[:, :W]
        valid = ((disp > 0) & (disp < self.max_disp)).astype(np.float32)
        if self.sparse_frac > 0.0:
            valid = valid * self._lidar_mask(rng, H, W)
        sample = {
            "left": left,
            "right": right,
            "disparity": disp,
            "valid": valid,
        }
        if self.left_right:
            # Right-view GT sampled with the same warp as the right image
            # (exact for these fronto-parallel layers).
            disp_r = np.empty((H, W), np.float32)
            for y in range(H):
                src = np.clip(
                    xs + disp_wide[y, :W].astype(np.int32), 0, W + pad - 1
                )
                disp_r[y] = disp_wide[y, src]
            sample["disparity_right"] = disp_r
            valid_r = ((disp_r > 0) & (disp_r < self.max_disp)).astype(
                np.float32
            )
            if self.sparse_frac > 0.0:
                valid_r = valid_r * self._lidar_mask(rng, H, W)
            sample["valid_right"] = valid_r
        return sample


def get_training_set(cfg_data, max_disp: int):
    """Factory mirroring reference dataloader/data.py get_training_set."""
    if cfg_data.kind == "synthetic":
        return SyntheticStereoDataset(
            crop_height=cfg_data.crop_height,
            crop_width=cfg_data.crop_width,
            max_disp=max_disp,
            training=True,
            left_right=cfg_data.left_right,
            sparse_frac=cfg_data.sparse_frac,
        )
    return StereoDataset(
        data_path=cfg_data.data_path,
        list_path=cfg_data.training_list,
        crop_height=cfg_data.crop_height,
        crop_width=cfg_data.crop_width,
        kind=cfg_data.kind,
        training=True,
        max_disp=max_disp,
        left_right=cfg_data.left_right,
    )


def get_test_set(cfg_data, max_disp: int):
    """Factory mirroring reference dataloader/data.py get_test_set."""
    if cfg_data.kind == "synthetic":
        return SyntheticStereoDataset(
            crop_height=cfg_data.crop_height,
            crop_width=cfg_data.crop_width,
            max_disp=max_disp,
            length=16,
            training=False,
            sparse_frac=cfg_data.sparse_frac,
        )
    return StereoDataset(
        data_path=cfg_data.data_path,
        list_path=cfg_data.val_list,
        crop_height=cfg_data.crop_height,
        crop_width=cfg_data.crop_width,
        kind=cfg_data.kind,
        training=False,
        max_disp=max_disp,
    )
