"""Real-data readiness drill: OCID/OSD wire-format fixture trees.

tools/make_real_fixtures.py writes rendered scenes into the exact on-disk
layouts the real datasets ship (indexed-PNG labels with OCID's plane-id
conventions, organized binary_compressed PCDs) so `tools/test_net.py
--dataset ocid_object_test` runs unchanged on a machine with the real data
(reference readers: lib/datasets/ocid_object.py:43-112,
lib/datasets/osd_object.py:60-88).  This test drills the full loop at
fixture scale: write -> dataset load -> GT equivalence with the renderer.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tools"))

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data import get_dataset
from unseenobjectclustering_tpu.data.datasets import process_label
from unseenobjectclustering_tpu.data.synthetic import SyntheticTabletopDataset


@pytest.mark.slow
def test_fixture_trees_load_with_reference_conventions(tmp_path):
    from make_real_fixtures import write_ocid, write_osd

    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TEST"})
    ds = SyntheticTabletopDataset("test", cfg, height=480, width=640, size=4)
    idxs = [0, 1, 2, 3]

    ocid_root = str(tmp_path / "OCID")
    write_ocid(ocid_root, ds, idxs, compressed=True)
    ocid = get_dataset("ocid_object_test", cfg, path=ocid_root)
    assert len(ocid) == 4

    # loader remaps (plane=1 -> bg; table seqs also 2 -> bg) must recover
    # the renderer GT up to consecutive relabeling; match by filename since
    # the dataset orders floor/seq01 before table/seq02
    by_name = {os.path.basename(str(p)): k
               for k, p in enumerate(ocid.image_paths)}
    for i in idxs:
        sample = ocid[by_name[f"result_2026_{i:04d}.png"]]
        _, depth_mm, gt = ds.get_scene(i)
        want = process_label(gt.astype(np.int32))
        np.testing.assert_array_equal(sample["label"], want)
        # NaNs in the compressed organized cloud -> 0, grid shape restored
        assert sample["depth"].shape == (480, 640, 3)
        assert np.isfinite(sample["depth"]).all()
        assert (sample["depth"][depth_mm == 0] == 0).all()
        assert (np.abs(sample["depth"][..., 2][depth_mm > 0]
                       - depth_mm[depth_mm > 0] / 1000.0) < 1e-3).all()

    osd_root = str(tmp_path / "OSD")
    write_osd(osd_root, ds, idxs[:2], compressed=True)
    osd = get_dataset("osd_object_test", cfg, path=osd_root)
    assert len(osd) == 2
    s = osd[0]
    _, _, gt = ds.get_scene(0)
    np.testing.assert_array_equal(s["label"], process_label(gt.astype(
        np.int32)))
    assert s["depth"].shape == (480, 640, 3)
