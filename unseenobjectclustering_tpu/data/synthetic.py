"""Procedural synthetic tabletop RGB-D scenes (self-contained trainer data).

The reference trains on the 34 GB Tabletop Object Dataset rendered offline
with PyBullet (README.md:60-66); that data cannot ship with the framework.
This module provides an in-process procedural substitute with the same
sample contract as TableTopObject: a pinhole camera looks down at a textured
table plane carrying K random convex objects (spheres / oriented boxes /
vertical cylinders), rendered by exact per-pixel ray casting with a z-buffer
(vectorized numpy, ~10 ms per 480x640 scene), then pushed through the SAME
augmentation + normalization stack (depth noise, chromatic, pixel sampling).

It exists so the full training loop can be exercised and validated
end-to-end — train a real embedding network, cluster a held-out scene,
measure F — without external datasets.  Registered as
`synthetic_tabletop_{train,test}`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data import augmentation
from unseenobjectclustering_tpu.data.datasets import (_DatasetBase,
                                                      process_label)


def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-12)


class SyntheticTabletopDataset(_DatasetBase):
    """Infinite procedural tabletop scenes (deterministic per index)."""

    def __init__(self, image_set: str, cfg: Config,
                 path: Optional[str] = None, base_seed: int = 3,
                 height: Optional[int] = None, width: Optional[int] = None,
                 size: Optional[int] = None, min_objects: Optional[int] = None,
                 max_objects: Optional[int] = None,
                 cache_dir: Optional[str] = None, raw: bool = False):
        super().__init__(cfg, base_seed + (0 if image_set == "train"
                                           else 777_000_001))
        self._name = "synthetic_tabletop_" + image_set
        # `path`, when given, doubles as an on-disk render cache (scenes are
        # a pure function of the index, like TOD's pre-rendered directories)
        self.cache_dir = cache_dir or path
        # raw mode: emit the cached uint8/uint16 scene untouched so the
        # whole augmentation + normalization stack runs on device
        # (ops/train_pipeline.py) — the host is 1 core in this container
        self.raw = raw
        # resolution / count come from the reference's synthetic-data config
        # keys (cfg.TRAIN.SYN_WIDTH/SYN_HEIGHT/SYNNUM/SYN_MIN_OBJECT/...)
        self.h = height or int(cfg.TRAIN.SYN_HEIGHT)
        self.w = width or int(cfg.TRAIN.SYN_WIDTH)
        size = size or int(cfg.TRAIN.SYNNUM)
        self._size = size if image_set == "train" else min(size, 200)
        self.min_objects = min_objects or int(cfg.TRAIN.SYN_MIN_OBJECT)
        self.max_objects = max_objects or int(cfg.TRAIN.SYN_MAX_OBJECT)
        # scenes are a fixed function of the index (a true dataset, like
        # TOD's pre-rendered scenes); only augmentation draws advance with
        # set_epoch.  Renders are memoized — ~0.5 MB/scene, so training is
        # compute-bound instead of renderer-bound from epoch 2 on.
        self._render_cache: dict[int, tuple] = {}
        self._cache_cap = 12000
        self.f = 0.5 * self.w  # ~53 deg horizontal FoV
        self.cx, self.cy = self.w / 2.0, self.h / 2.0

    # -- geometry -------------------------------------------------------------

    def _rays(self):
        if not hasattr(self, "_ray_cache"):
            v, u = np.mgrid[:self.h, :self.w].astype(np.float32)
            d = np.stack([(u - self.cx) / self.f, (v - self.cy) / self.f,
                          np.ones_like(u)], axis=-1).astype(np.float32)
            self._ray_cache = d
        return self._ray_cache  # unnormalized: t = z-depth along the axis

    def _scene_frame(self, rng):
        """Table plane: camera tilted ~30-50 deg looking at the table."""
        tilt = np.radians(rng.uniform(25, 55))
        n = np.array([0.0, -np.cos(tilt), -np.sin(tilt)], np.float32)
        p0 = np.array([0.0, 0.25, rng.uniform(0.7, 1.1)], np.float32)
        t1 = _normalize(np.cross(n, [0.0, 0.0, 1.0]))
        t2 = np.cross(n, t1)
        return n, p0, t1.astype(np.float32), t2.astype(np.float32)

    def render(self, rng) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (bgr uint8 [H,W,3], depth_m float32 [H,W], labels int32)."""
        h, w = self.h, self.w
        d = self._rays()                      # [H,W,3]
        n, p0, t1, t2 = self._scene_frame(rng)

        zbuf = np.full((h, w), np.inf, np.float32)
        labels = np.zeros((h, w), np.int32)
        normal_buf = np.zeros((h, w, 3), np.float32)
        color_ids = np.zeros((h, w), np.int32)

        # table plane: t = (p0 . n) / (d . n)
        dn = d @ n
        t_plane = np.where(dn < -1e-6, (p0 @ n) / np.where(
            np.abs(dn) < 1e-6, -1e-6, dn), np.inf).astype(np.float32)
        table_extent = 0.9
        hit_p = d * t_plane[..., None]
        rel = hit_p - p0
        uu, vv = rel @ t1, rel @ t2
        on_table = ((t_plane > 0.05) & (np.abs(uu) < table_extent)
                    & (np.abs(vv) < table_extent))
        zbuf = np.where(on_table, t_plane, zbuf)
        normal_buf[on_table] = n
        uv_table = (uu, vv)

        k = rng.randint(self.min_objects, self.max_objects + 1)
        for obj in range(1, k + 1):
            cu = rng.uniform(-0.45, 0.45)
            cv_ = rng.uniform(-0.35, 0.45)
            kind = rng.randint(3)
            # "up" from the table = +n (the camera is on the +n side)
            if kind == 0:   # sphere resting on the plane
                r = np.float32(rng.uniform(0.03, 0.07))
                c = (p0 + cu * t1 + cv_ * t2 + r * n).astype(np.float32)
                # solve |t d - c|^2 = r^2
                a = (d * d).sum(-1)
                bq = -2 * (d @ c)
                cq = np.float32(c @ c - r * r)
                disc = bq * bq - 4 * a * cq
                with np.errstate(invalid="ignore"):
                    tt = np.where(
                        disc > 0,
                        (-bq - np.sqrt(np.maximum(disc, 0))) / (2 * a),
                        np.inf).astype(np.float32)
                hit = (tt > 0.05) & (tt < zbuf)
                with np.errstate(invalid="ignore"):
                    pt = d * tt[..., None]
                    nrm = pt - c[None, None]
                    nrm = nrm / np.maximum(
                        np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
                nrm = np.nan_to_num(nrm)
            else:           # box or vertical cylinder, in the table frame
                yaw = rng.uniform(0, np.pi)
                a1 = (np.cos(yaw) * t1 + np.sin(yaw) * t2).astype(np.float32)
                a2 = (-np.sin(yaw) * t1 + np.cos(yaw) * t2).astype(np.float32)
                a3 = n  # up
                hx = np.float32(rng.uniform(0.025, 0.06))
                hy = np.float32(rng.uniform(0.025, 0.06))
                hz = np.float32(rng.uniform(0.04, 0.12))
                if kind == 2:
                    hy = hx  # cylinder radius
                c = (p0 + cu * t1 + cv_ * t2 + hz * a3).astype(np.float32)
                # ray in object frame
                ro = -np.stack([c @ a1, c @ a2, c @ a3])
                rd = np.stack([d @ a1, d @ a2, d @ a3], axis=-1)
                if kind == 1:  # OBB slab test
                    with np.errstate(divide="ignore", invalid="ignore"):
                        inv = 1.0 / rd
                    lo = (np.array([-hx, -hy, -hz]) - ro) * inv
                    hi = (np.array([hx, hy, hz]) - ro) * inv
                    tmin = np.minimum(lo, hi).max(axis=-1)
                    tmax = np.maximum(lo, hi).min(axis=-1)
                    tt = np.where((tmax > tmin) & (tmin > 0.05),
                                  tmin, np.inf).astype(np.float32)
                    hit = tt < zbuf
                    with np.errstate(invalid="ignore"):
                        pt_o = ro[None, None] + rd * tt[..., None]
                    # face normal = dominant axis of the hit point
                    scale = np.abs(pt_o) / np.array([hx, hy, hz])
                    face = np.argmax(scale, axis=-1)
                    sgn = np.take_along_axis(
                        np.sign(pt_o), face[..., None], axis=-1)[..., 0]
                    axes = np.stack([a1, a2, a3])
                    nrm = axes[face] * sgn[..., None]
                else:          # finite vertical cylinder + top cap
                    a = rd[..., 0] ** 2 + rd[..., 1] ** 2
                    bq = 2 * (ro[0] * rd[..., 0] + ro[1] * rd[..., 1])
                    cq = ro[0] ** 2 + ro[1] ** 2 - hx * hx
                    disc = bq * bq - 4 * a * cq
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t_side = np.where(
                            (disc > 0) & (a > 1e-12),
                            (-bq - np.sqrt(np.maximum(disc, 0))) / (2 * a),
                            np.inf)
                    zs = ro[2] + rd[..., 2] * t_side
                    t_side = np.where(np.abs(zs) <= hz, t_side, np.inf)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        # top cap faces the camera at +hz along a3 (up)
                        t_cap = (hz - ro[2]) / rd[..., 2]
                    pu = ro[0] + rd[..., 0] * t_cap
                    pv = ro[1] + rd[..., 1] * t_cap
                    t_cap = np.where(
                        (pu * pu + pv * pv <= hx * hx) & (t_cap > 0),
                        t_cap, np.inf)
                    tt = np.minimum(t_side, t_cap).astype(np.float32)
                    tt = np.where(tt > 0.05, tt, np.inf)
                    hit = tt < zbuf
                    side = t_side < t_cap
                    with np.errstate(invalid="ignore"):
                        pt_o = ro[None, None] + rd * tt[..., None]
                        nrm_side = (pt_o[..., 0, None] * a1[None, None]
                                    + pt_o[..., 1, None] * a2[None, None])
                        nn = np.linalg.norm(nrm_side, axis=-1, keepdims=True)
                        nrm_side = nrm_side / np.maximum(nn, 1e-9)
                    nrm_side = np.nan_to_num(nrm_side)
                    nrm = np.where(side[..., None], nrm_side,
                                   a3[None, None] * np.ones_like(nrm_side))
            zbuf = np.where(hit, tt, zbuf)
            labels = np.where(hit, obj, labels)
            normal_buf[hit] = nrm[hit]
            color_ids = np.where(hit, obj, color_ids)

        # shading: ambient + lambertian
        light = _normalize(np.array([0.3, -0.8, -0.5]))
        lambert = np.clip(-(normal_buf @ light), 0.0, 1.0)
        shade = 0.4 + 0.6 * lambert
        palette = rng.uniform(0.2, 1.0, size=(k + 1, 3))
        palette[0] = rng.uniform(0.35, 0.9, size=3)  # table base color
        base = palette[color_ids]
        # table texture: smooth noise
        tex = rng.rand(h // 8 + 1, w // 8 + 1)
        tex = np.kron(tex, np.ones((8, 8)))[:h, :w]
        base[color_ids == 0] *= (0.8 + 0.4 * tex[color_ids == 0])[..., None]
        rgb = base * shade[..., None]
        valid = np.isfinite(zbuf)
        rgb[~valid] = rng.uniform(0, 0.1)
        bgr = (np.clip(rgb[..., ::-1], 0, 1) * 255).astype(np.uint8)

        depth = np.where(valid, zbuf, 0.0).astype(np.float32)
        labels = np.where(valid, labels, 0)
        return bgr, depth, labels

    # -- scene cache (memory -> disk -> render) --------------------------------

    def _scene_path(self, idx: int) -> str:
        import os
        return os.path.join(self.cache_dir,
                            f"{self._name}_{self.h}x{self.w}",
                            f"{idx:06d}.npz")

    def get_scene(self, idx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Deterministic scene for `idx`: (bgr uint8, depth_mm uint16,
        label uint8), already process_label'd.  Rendering is the expensive
        step (~0.8 s at 480x640 on this 1-core host), so scenes are memoized
        in RAM and, when `cache_dir` is set, persisted to disk — the same
        regime as the reference's pre-rendered TOD directories."""
        import os
        cached = self._render_cache.get(idx)
        if cached is not None:
            return cached
        scene = None
        if self.cache_dir:
            p = self._scene_path(idx)
            if os.path.exists(p):
                with np.load(p) as z:
                    scene = (z["bgr"], z["depth_mm"], z["label"])
        if scene is None:
            scene_rng = np.random.RandomState(
                (self.base_seed * 7_368_787 + idx) % (2 ** 31 - 1))
            bgr, depth, labels = self.render(scene_rng)
            labels = process_label(labels)
            scene = (bgr, (depth * 1000).astype(np.uint16),
                     labels.astype(np.uint8))
            if self.cache_dir:
                p = self._scene_path(idx)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                tmp = p + f".tmp{os.getpid()}"
                with open(tmp, "wb") as fh:  # file handle: no .npz suffixing
                    np.savez(fh, bgr=scene[0], depth_mm=scene[1],
                             label=scene[2])
                os.replace(tmp, p)  # atomic: safe under a prerender process
        if len(self._render_cache) < self._cache_cap:
            self._render_cache[idx] = scene
        return scene

    # -- sample contract --------------------------------------------------------

    def __getitem__(self, idx: int) -> dict:
        from unseenobjectclustering_tpu.data.datasets import (TableTopObject,
                                                              compute_xyz_np)

        cfg = self.cfg
        rng = self._rng(idx)  # augmentation stream: (epoch, index)
        bgr, depth_mm, labels8 = self.get_scene(idx)
        if self.raw:
            return {"bgr": bgr, "depth_mm": depth_mm,
                    "label_raw": labels8,
                    "filename": f"synthetic/{idx:08d}"}
        bgr = bgr.copy()
        depth = depth_mm.astype(np.float32) / 1000.0
        labels = labels8.astype(np.int32)

        xyz = None
        if cfg.INPUT in ("DEPTH", "RGBD"):
            if cfg.MODE == "TRAIN":
                depth = augmentation.add_noise_to_depth(
                    depth, augmentation.DEFAULT_NOISE_PARAMS, rng)
                depth = augmentation.dropout_random_ellipses(
                    depth, augmentation.DEFAULT_NOISE_PARAMS, rng)
            xyz = compute_xyz_np(depth, self.f, self.f, self.cx, self.cy)
            if cfg.MODE == "TRAIN":
                xyz = augmentation.add_noise_to_xyz(
                    xyz, depth, augmentation.DEFAULT_NOISE_PARAMS, rng)

        if cfg.TRAIN.SYN_CROP:
            # object-centric square crops for zoom-in training — the same
            # pad_crop_resize the TOD loader uses (tabletop_object.py:175-237)
            bgr, labels, xyz = TableTopObject.pad_crop_resize(
                self, bgr, labels, xyz, rng)
            labels = process_label(labels)

        if cfg.TRAIN.EMBEDDING_SAMPLING and cfg.MODE == "TRAIN":
            labels = TableTopObject.sample_pixels(
                self, labels, int(cfg.TRAIN.EMBEDDING_SAMPLING_NUM), rng)

        bgr = self._maybe_augment_rgb(bgr, rng)
        sample = {
            "label": labels.astype(np.int32),
            "image_color": self._normalize_bgr(bgr),
            "filename": f"synthetic/{idx:08d}",
        }
        if xyz is not None:
            sample["depth"] = xyz.astype(np.float32)
        return sample
