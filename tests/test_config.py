"""Config system tests: defaults, strict merge, YAML compatibility with the
reference's shipped recipe files."""

import glob
import os

import numpy as np
import pytest

from unseenobjectclustering_tpu.config import Config, default_dict

REF_CFG_DIR = "/root/reference/experiments/cfgs"


def test_defaults():
    cfg = Config.default()
    assert cfg.INPUT == "RGBD"
    assert cfg.TRAIN.EMBEDDING_ALPHA == 0.02
    assert cfg.TRAIN.EMBEDDING_DELTA == 0.5
    assert cfg.TRAIN.EMBEDDING_METRIC == "euclidean"
    assert cfg.TRAIN.FUSION_TYPE == "add"
    assert cfg.TEST.IMS_PER_BATCH == 1
    np.testing.assert_allclose(cfg.pixel_means,
                               [102.9801, 115.9465, 122.7717])


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        Config.from_dict({"NOT_A_KEY": 1})
    with pytest.raises(KeyError):
        Config.from_dict({"TRAIN": {"NOT_A_KEY": 1}})


def test_type_mismatch_raises():
    with pytest.raises(ValueError):
        Config.from_dict({"INPUT": 3})


def test_replace_immutable():
    cfg = Config.default()
    cfg2 = cfg.replace(INPUT="COLOR")
    assert cfg.INPUT == "RGBD"
    assert cfg2.INPUT == "COLOR"
    with pytest.raises(AttributeError):
        cfg.TRAIN.SYN_CROP = True


def test_cluster_epsilon_derived():
    cfg = Config.default()
    assert cfg.cluster_epsilon == pytest.approx(0.04)  # 2 * alpha
    cfg2 = cfg.replace(CLUSTER={"EPSILON": 0.1})
    assert cfg2.cluster_epsilon == pytest.approx(0.1)


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference configs not mounted")
@pytest.mark.parametrize("path", sorted(glob.glob(f"{REF_CFG_DIR}/*.yml")))
def test_loads_every_reference_recipe(path):
    cfg = Config.from_yaml(path)
    # the flagship recipe settings must round-trip
    assert cfg.TRAIN.EMBEDDING_METRIC == "cosine"
    assert cfg.TRAIN.NUM_UNITS == 64
    assert cfg.TRAIN.IMS_PER_BATCH > 0
    assert isinstance(cfg.TRAIN.MILESTONES, tuple)


def test_flagship_recipe_values():
    path = f"{REF_CFG_DIR}/seg_resnet34_8s_embedding_cosine_rgbd_add_tabletop.yml"
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    cfg = Config.from_yaml(path)
    assert cfg.INPUT == "RGBD"
    assert cfg.TRAIN.FUSION_TYPE == "add"
    assert cfg.TRAIN.EMBEDDING_SAMPLING is True
    assert cfg.TRAIN.EMBEDDING_SAMPLING_NUM == 1000
    assert cfg.TRAIN.LEARNING_RATE == pytest.approx(1e-5)
    assert cfg.TRAIN.WEIGHT_DECAY == pytest.approx(5e-4)
    assert cfg.TRAIN.MILESTONES == (3,)
    assert cfg.EXP_DIR == "tabletop_object"


def test_default_dict_sections():
    d = default_dict()
    assert set(d["CLUSTER"]) >= {"KAPPA", "NUM_SEEDS", "MAX_ITERS",
                                 "MAX_INSTANCES"}


def test_config_hashable_and_comparable():
    """Frozen Config must behave like a value: equal defaults hash equal
    (usable as a jit static argument), and section views are cached and
    comparable instead of fresh O(section) copies per access."""
    c = Config.default()
    assert hash(c) == hash(Config.default())
    assert c == Config.default()
    assert c != Config.from_dict({"INPUT": "COLOR"})
    assert c.TRAIN is c.TRAIN            # cached view
    assert c.TRAIN == Config.default().TRAIN


def test_config_dotted_replace():
    c = Config.default().replace(**{"TRAIN.SYN_CROP": True}, INPUT="COLOR")
    assert c.TRAIN.SYN_CROP is True and c.INPUT == "COLOR"
    # dotted + nested overrides for the same section merge
    c2 = Config.default().replace(**{"TRAIN.SYN_CROP": True},
                                  TRAIN={"NUM_UNITS": 8})
    assert c2.TRAIN.SYN_CROP is True and c2.TRAIN.NUM_UNITS == 8


def test_config_owns_its_tree():
    """Config(tree) deep-copies (mutating the caller's dict must not
    change a frozen config) and rejects structurally empty trees."""
    import pytest

    t = Config.default().to_dict()
    c = Config(t)
    t["INPUT"] = "MUTATED"
    assert c.INPUT != "MUTATED"
    with pytest.raises(KeyError, match="TRAIN"):
        Config({})


def test_config_tuple_override_validation():
    import pytest

    with pytest.raises(ValueError, match="3"):
        Config.from_dict({"PIXEL_MEANS": [1.0, 2.0]})
    with pytest.raises(ValueError, match="MILESTONES"):
        Config.from_dict({"TRAIN": {"MILESTONES": ["a", "b"]}})
    c = Config.from_dict({"TRAIN": {"MILESTONES": [4, 8]}})
    assert c.TRAIN.MILESTONES == (4, 8)


def test_output_dir_anchored_at_repo_root(monkeypatch, tmp_path):
    """get_output_dir resolves against the repo root, not the cwd
    (reference ROOT_DIR semantics, lib/fcn/config.py:395-405): runs from
    different directories must find each other's snapshots."""
    from unseenobjectclustering_tpu.config import get_output_dir

    monkeypatch.chdir(tmp_path)
    out = get_output_dir(Config.default(), "ds")
    assert not out.startswith(str(tmp_path))
    assert out.endswith("output/default/ds")


def test_hash_eq_contract_numeric_types():
    """Trees that compare equal under dict __eq__ but differ in numeric
    type (1 vs 1.0 vs True) must hash equal, or Config/Section silently
    miss jit caches when riding as static arguments (ADVICE r2)."""
    # the strict merge coerces/rejects mixed numeric types, so build the
    # divergent trees directly (the form jit static args can carry)
    ta, tb = default_dict(), default_dict()
    ta["TRAIN"]["NUM_UNITS"] = 64
    tb["TRAIN"]["NUM_UNITS"] = 64.0
    a, b = Config(ta), Config(tb)
    assert a == b
    assert hash(a) == hash(b)
    assert hash(a.TRAIN) == hash(b.TRAIN)
    tc, td = default_dict(), default_dict()
    tc["TRAIN"]["EMBEDDING_SAMPLING"] = True
    td["TRAIN"]["EMBEDDING_SAMPLING"] = 1
    c, d = Config(tc), Config(td)
    assert c == d
    assert hash(c) == hash(d)


def test_replace_does_not_mutate_caller_override():
    """replace(TRAIN={...}, **{'TRAIN.X': v}) must not write X into the
    caller's dict (ADVICE r2: Mapping stored by reference + setdefault)."""
    mine = {"NUM_UNITS": 8}
    cfg = Config.default().replace(TRAIN=mine, **{"TRAIN.SYN_CROP": True})
    assert cfg.TRAIN.NUM_UNITS == 8 and cfg.TRAIN.SYN_CROP is True
    assert mine == {"NUM_UNITS": 8}
    # dotted key first, nested dict second: same guarantee
    mine2 = {"NUM_UNITS": 8}
    cfg2 = Config.default().replace(**{"TRAIN.SYN_CROP": True}, TRAIN=mine2)
    assert cfg2.TRAIN.NUM_UNITS == 8 and cfg2.TRAIN.SYN_CROP is True
    assert mine2 == {"NUM_UNITS": 8}
