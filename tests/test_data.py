"""Data-layer tests: PCD parsing, dataset loaders on synthetic fixture trees,
augmentation determinism, batching loader."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data import DataLoader, get_dataset
from unseenobjectclustering_tpu.data import augmentation
from unseenobjectclustering_tpu.data.datasets import process_label
from unseenobjectclustering_tpu.data.pcd import (load_pcd_xyz, lzf_decompress,
                                                 save_pcd_xyz)
from unseenobjectclustering_tpu.utils.masks import imwrite_indexed

H, W = 48, 64


# ---------------------------------------------------------------------------
# fixtures: tiny on-disk dataset trees
# ---------------------------------------------------------------------------

def make_tod_tree(root, n_scenes=2, views=7):
    rng = np.random.RandomState(0)
    for s in range(n_scenes):
        d = os.path.join(root, "training_set", f"scene_{s:05d}")
        os.makedirs(d)
        for v in range(views):
            lab = np.zeros((H, W), np.uint8)
            lab[10:20, 10:20] = 2   # object (1 = table -> bg)
            lab[25:35, 30:45] = 3
            lab[0:5, 0:60] = 1      # table
            imwrite_indexed(os.path.join(d, "segmentation_%05d.png" % v), lab)
            im = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(d, "rgb_%05d.jpeg" % v), im)
            depth = rng.randint(500, 1500, (H, W)).astype(np.uint16)
            cv2.imwrite(os.path.join(d, "depth_%05d.png" % v), depth)
    return root


def make_osd_tree(root, n=3):
    rng = np.random.RandomState(1)
    for sub in ("image_color", "annotation", "pcd"):
        os.makedirs(os.path.join(root, sub))
    for i in range(n):
        name = f"learn{i}.png"
        im = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(root, "image_color", name), im)
        lab = np.zeros((480, 640), np.uint8)
        lab[100:200, 100:200] = 1
        imwrite_indexed(os.path.join(root, "annotation", name), lab)
        xyz = rng.rand(480, 640, 3).astype(np.float32)
        save_pcd_xyz(os.path.join(root, "pcd", name.replace("png", "pcd")),
                     xyz, binary=(i % 2 == 0))
    return root


# ---------------------------------------------------------------------------
# PCD
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("binary", [True, False])
def test_pcd_roundtrip(tmp_path, binary):
    rng = np.random.RandomState(2)
    xyz = rng.randn(100, 3).astype(np.float32)
    p = tmp_path / "t.pcd"
    save_pcd_xyz(p, xyz, binary=binary)
    got = load_pcd_xyz(p)
    np.testing.assert_allclose(got, xyz, rtol=1e-6)


def test_pcd_preserves_nan(tmp_path):
    xyz = np.ones((10, 3), np.float32)
    xyz[3] = np.nan
    p = tmp_path / "n.pcd"
    save_pcd_xyz(p, xyz, binary=True)
    got = load_pcd_xyz(p)
    assert np.isnan(got[3]).all() and not np.isnan(got[4]).any()


def test_lzf_literal_and_backref():
    # literal run: ctrl < 32 => ctrl+1 bytes follow
    data = bytes([3, 65, 66, 67, 68])  # 'ABCD'
    assert lzf_decompress(data, 4) == b"ABCD"
    # backref: 'ABAB' = literal 'AB' + backref len 2 offset 2
    # ctrl byte: length=2 -> (length-2)=0 in top 3 bits? encoding: ctrl =
    # ((len-2) << 5) | (offset-1 >> 8); followed by (offset-1) & 0xFF
    comp = bytes([1, 65, 66, (2 - 2 + 1) << 5 | 0, 1])
    # (2-2)<<5 would be a literal; use len 3 ('ABA'): ctrl=(3-2)<<5=32
    comp = bytes([1, 65, 66, 32, 1])
    assert lzf_decompress(comp, 5) == b"ABABA"


def test_pcd_binary_compressed(tmp_path):
    """Hand-build a binary_compressed PCD with literal-only LZF blocks."""
    import struct
    xyz = np.arange(12, dtype=np.float32).reshape(4, 3)
    # SoA layout: xxxx yyyy zzzz
    soa = np.concatenate([xyz[:, 0], xyz[:, 1], xyz[:, 2]]).tobytes()
    # literal-encode in <=32-byte runs
    comp = b""
    for i in range(0, len(soa), 32):
        chunk = soa[i:i + 32]
        comp += bytes([len(chunk) - 1]) + chunk
    header = ("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
              "COUNT 1 1 1\nWIDTH 4\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
              "POINTS 4\nDATA binary_compressed\n")
    p = tmp_path / "c.pcd"
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(struct.pack("<II", len(comp), len(soa)))
        f.write(comp)
    got = load_pcd_xyz(p)
    np.testing.assert_allclose(got, xyz)


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

def test_process_label_remaps_to_contiguous():
    lab = np.array([[0, 5, 5], [9, 0, 9]], np.int32)
    got = process_label(lab)
    assert set(np.unique(got)) == {0, 1, 2}
    assert got[0, 1] == 1 and got[1, 0] == 2


def test_tabletop_dataset(tmp_path):
    root = make_tod_tree(str(tmp_path / "tod"))
    cfg = Config.from_dict({"MODE": "TRAIN", "INPUT": "RGBD",
                            "TRAIN": {"CHROMATIC": True, "ADD_NOISE": True}})
    ds = get_dataset("tabletop_object_train", cfg, path=root)
    assert len(ds) == 2 * 7
    s = ds[0]
    assert s["image_color"].shape == (H, W, 3)
    assert s["depth"].shape == (H, W, 3)
    assert s["label"].shape == (H, W)
    assert s["label"].max() == 2  # two objects after table removal + remap
    # deterministic per-index randomness
    s2 = ds[0]
    np.testing.assert_array_equal(s["image_color"], s2["image_color"])


def test_tabletop_syn_crop_and_sampling(tmp_path):
    root = make_tod_tree(str(tmp_path / "tod"))
    cfg = Config.from_dict({
        "MODE": "TRAIN", "INPUT": "RGBD",
        "TRAIN": {"SYN_CROP": True, "SYN_CROP_SIZE": 32,
                  "EMBEDDING_SAMPLING": True,
                  "EMBEDDING_SAMPLING_NUM": 30}})
    ds = get_dataset("tabletop_object_train", cfg, path=root)
    assert len(ds) == 2 * 5  # crop mode: 5 views per scene
    s = ds[3]
    assert s["image_color"].shape == (32, 32, 3)
    assert s["label"].shape == (32, 32)
    # sampled: every cluster has <= 30 labeled pixels, rest are -1
    lab = s["label"]
    for k in np.unique(lab):
        if k >= 0:
            assert (lab == k).sum() <= 30
    assert (lab == -1).any()


def test_osd_dataset(tmp_path):
    root = make_osd_tree(str(tmp_path / "OSD"))
    cfg = Config.from_dict({"MODE": "TEST", "INPUT": "RGBD"})
    ds = get_dataset("osd_object_test", cfg, path=root)
    assert len(ds) == 3
    s = ds[0]
    assert s["depth"].shape == (480, 640, 3)
    assert s["label"].max() == 1
    assert s["filename"]  # non-empty


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((4, 4), i, np.float32), "filename": str(i)}


def test_loader_batching_and_shuffle():
    dl = DataLoader(_ToyDataset(10), batch_size=4, shuffle=True,
                    num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    assert batches[0]["x"].shape == (4, 4, 4)
    assert len(batches[0]["filename"]) == 4
    # epoch 2 reshuffles
    batches2 = list(dl)
    ids1 = [b["x"][:, 0, 0].tolist() for b in batches]
    ids2 = [b["x"][:, 0, 0].tolist() for b in batches2]
    assert ids1 != ids2


def test_loader_set_epoch_resume_parity():
    """A resumed run (set_epoch(k)) must produce the same data order as a
    fresh run that iterated to epoch k — not replay epoch 0 (the resume
    data-order bug)."""
    def orders(dl, epochs):
        out = []
        for _ in range(epochs):
            out.append([b["x"][:, 0, 0].tolist() for b in dl])
        return out

    fresh = orders(DataLoader(_ToyDataset(12), batch_size=4, shuffle=True,
                              num_workers=0, seed=7), 4)
    resumed = DataLoader(_ToyDataset(12), batch_size=4, shuffle=True,
                         num_workers=0, seed=7)
    resumed.set_epoch(2)
    assert [b["x"][:, 0, 0].tolist() for b in resumed] == fresh[2]
    # and it continues with epoch 3's order
    assert [b["x"][:, 0, 0].tolist() for b in resumed] == fresh[3]


def test_loader_sequential_no_drop():
    dl = DataLoader(_ToyDataset(5), batch_size=2, shuffle=False,
                    num_workers=0, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[-1]["x"].shape[0] == 1
    flat = np.concatenate([b["x"][:, 0, 0] for b in batches])
    np.testing.assert_array_equal(flat, np.arange(5))


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------

def test_augmentation_deterministic_with_rng():
    rng1, rng2 = np.random.RandomState(5), np.random.RandomState(5)
    im = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    a = augmentation.chromatic_transform(im, rng=rng1)
    b = augmentation.chromatic_transform(im, rng=rng2)
    np.testing.assert_array_equal(a, b)
    a = augmentation.add_noise(im, rng=np.random.RandomState(1))
    assert a.shape == im.shape and a.dtype == np.uint8


def test_depth_augmentations():
    rng = np.random.RandomState(3)
    depth = np.full((32, 32), 1.0, np.float32)
    noisy = augmentation.add_noise_to_depth(depth, augmentation.DEFAULT_NOISE_PARAMS, rng)
    assert noisy.shape == depth.shape
    assert 0.8 < noisy.mean() < 1.2  # gamma(1000, 0.001) ~ 1.0
    dropped = augmentation.dropout_random_ellipses(
        depth, augmentation.DEFAULT_NOISE_PARAMS, rng)
    assert (dropped == 0).any()  # some ellipses dropped
    xyz = np.ones((32, 32, 3), np.float32)
    noisy_xyz = augmentation.add_noise_to_xyz(
        xyz, depth, augmentation.DEFAULT_NOISE_PARAMS, rng)
    assert not np.array_equal(noisy_xyz, xyz)
    assert np.abs(noisy_xyz - xyz).max() < 0.1


def test_perturb_mask():
    cfg = Config.default()
    mask = np.zeros((48, 48), np.uint8)
    mask[12:30, 14:32] = 1
    out = augmentation.perturb_mask(mask, cfg.TRAIN,
                                    np.random.RandomState(4))
    assert out.shape == mask.shape
    assert out.sum() >= 2  # never returns an empty mask


def make_ocid_tree(root, n=2):
    """OCID-style tree: ARID20/<x>/seq01/{rgb,label,pcd}/...; includes a
    'table' sequence to exercise the label-2 remap."""
    rng = np.random.RandomState(4)
    for seq, is_table in (("ARID20/floor/seq01", False),
                          ("ARID20/table/seq02", True)):
        for sub in ("rgb", "label", "pcd"):
            os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
        for i in range(n):
            name = f"result_{i}.png"
            im = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(root, seq, "rgb", name), im)
            lab = np.zeros((480, 640), np.uint8)
            lab[50:100, 50:100] = 1      # table plane -> bg
            lab[150:250, 150:300] = 2    # table seqs: also bg
            lab[300:400, 400:500] = 3    # object
            imwrite_indexed(os.path.join(root, seq, "label", name), lab)
            xyz = rng.rand(480, 640, 3).astype(np.float32)
            xyz[0, 0] = np.nan  # pcl NaN handling
            save_pcd_xyz(os.path.join(root, seq, "pcd",
                                      name.replace("png", "pcd")), xyz)
    return root


def test_ocid_dataset(tmp_path):
    root = make_ocid_tree(str(tmp_path / "OCID"))
    cfg = Config.from_dict({"MODE": "TEST", "INPUT": "RGBD"})
    ds = get_dataset("ocid_object_test", cfg, path=root)
    assert len(ds) == 4
    # non-table sequence: labels 2 and 3 remain objects (remapped 1, 2)
    floor_idx = [i for i in range(4)
                 if "floor" in str(ds.image_paths[i])][0]
    s = ds[floor_idx]
    assert s["label"].max() == 2
    assert not np.isnan(s["depth"]).any()  # NaNs zeroed
    # table sequence: label 2 also becomes background -> one object
    table_idx = [i for i in range(4)
                 if "table" in str(ds.image_paths[i])][0]
    s = ds[table_idx]
    assert s["label"].max() == 1
    assert s["filename"].startswith("ARID20")


def test_epoch_advances_augmentation(tmp_path):
    """Per-epoch RNG: the same index yields different augmentation draws
    across epochs (reference parity — ambient np.random redraws), while
    direct indexing (eval) stays deterministic at epoch 0."""
    root = make_tod_tree(str(tmp_path / "tod"), n_scenes=1, views=7)
    cfg = Config.from_dict({"MODE": "TRAIN", "INPUT": "RGBD",
                            "TRAIN": {"CHROMATIC": True, "ADD_NOISE": True}})
    ds = get_dataset("tabletop_object_train", cfg, path=root)
    a = ds[0]["image_color"]
    ds.set_epoch(1)
    b = ds[0]["image_color"]
    assert not np.array_equal(a, b)
    ds.set_epoch(0)
    c = ds[0]["image_color"]
    np.testing.assert_array_equal(a, c)


def test_pcd_compressed_roundtrip(tmp_path):
    """save_pcd_xyz(compressed=True) writes real LZF binary_compressed
    PCDs (the OCID/OSD wire format) that both the python and native
    decompressors read back exactly — incl. back-references on repetitive
    data and NaNs."""
    from unseenobjectclustering_tpu.data.pcd import (load_pcd_xyz,
                                                     lzf_compress,
                                                     _lzf_decompress_py,
                                                     save_pcd_xyz)

    rng = np.random.RandomState(11)
    xyz = rng.rand(40, 50, 3).astype(np.float32)
    xyz[::7, ::5] = 0.0          # repetition -> exercises back-references
    xyz[3, 4] = np.nan
    p = str(tmp_path / "c.pcd")
    save_pcd_xyz(p, xyz, compressed=True)
    got = load_pcd_xyz(p).reshape(40, 50, 3)
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=-1), np.nan_to_num(xyz, nan=-1))

    # encoder vs pure-python decoder on adversarial byte patterns
    for raw in (b"", b"a", b"ab", b"abc" * 100, bytes(range(256)) * 3,
                b"\x00" * 1000, rng.bytes(4096)):
        assert _lzf_decompress_py(lzf_compress(raw), len(raw)) == raw
