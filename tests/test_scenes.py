"""Tests for scene-id DSL, group parsing, coupling, and samplers."""

import numpy as np
import pytest

from nvsr_tpu.scenes import (
    Counter,
    ImageSampler,
    SceneCoupler,
    SceneSampler,
    extract_ds_and_res,
    get_plane_name,
    get_scene_configs,
    get_scene_id,
    interpret_scene_list,
    parse_scene_group_key,
    plane_name2scene,
    scene_basedir,
    subsample_eval_scenes,
)


def test_scene_id_roundtrip():
    sid = get_scene_id("lego", 8, (200, 32))
    assert sid == "lego_DS8_PlRes200_32"
    assert extract_ds_and_res(sid) == (8, 200)
    assert get_scene_id("lego", 4, (None, None)) == "lego_DS4"
    assert extract_ds_and_res("lego_DS4") == (4, None)
    assert scene_basedir("lego##1_DS8_PlRes200_32") == "lego"


def test_plane_names():
    sid = "lego_DS8_PlRes200_32"
    assert get_plane_name(sid, 0) == "sclego_DS8_PlRes200_32_D0"
    assert plane_name2scene(get_plane_name(sid, 2)) == sid
    assert get_plane_name(None, 3) == "_D3"


def test_parse_group_keys():
    # full defaults chain (reference load_blender.py:209-216)
    assert parse_scene_group_key("8,200,32") == (8, 200, 32, "synt", 1, [])
    assert parse_scene_group_key("8,200") == (8, 200, 200, "synt", 1, [])
    assert parse_scene_group_key("8,") == (8, None, None, "synt", 1, [])
    assert parse_scene_group_key("8,200,32,'llff'") == (
        8, 200, 32, "llff", 1, [])
    assert parse_scene_group_key("8,200,32,'synt',0") == (
        8, 200, 32, "synt", 0, [])
    assert parse_scene_group_key("8,200,32,'synt',None,['decoder']") == (
        8, 200, 32, "synt", 1, ["decoder"])


def test_interpret_scene_list():
    assert interpret_scene_list(["a", [0, 3], "b"]) == \
        ["a", "0", "1", "2", "b"]


def test_get_scene_configs_probability_spread():
    specs = get_scene_configs({"8,200,32": ["a", "b"],
                               "2,800,32,'synt',0": ["c"]})
    assert [s.scene_id for s in specs] == [
        "a_DS8_PlRes200_32", "b_DS8_PlRes200_32", "c_DS2_PlRes800_32"]
    assert specs[0].prob == 0.5 and specs[1].prob == 0.5
    assert specs[2].prob == 0.0
    specs = get_scene_configs({"8,200,32": ["a", "b"]},
                              prob_assigned2scene_groups=False)
    assert specs[0].prob == 1.0


def test_scene_coupler_pairs_and_ds_factor():
    lr = ["house_DS8_PlRes200_32", "lego_DS8_PlRes200_32"]
    hr = ["house_DS2_PlRes800_32", "lego_DS2_PlRes800_32"]
    coupler = SceneCoupler(lr + hr, planes_res="LR", num_pos_planes=3,
                           training_scenes=lr + hr[:1])
    assert coupler.ds_factor == 4
    # HR scenes store planes at their LR couple
    assert coupler.scene2saved["house_DS2_PlRes800_32"] == \
        "house_DS8_PlRes200_32"
    assert coupler.scene2saved["house_DS8_PlRes200_32"] == \
        "house_DS8_PlRes200_32"
    assert coupler.should_SR("house_DS2_PlRes800_32")
    assert not coupler.should_SR("house_DS8_PlRes200_32")
    assert coupler.should_SR(
        get_plane_name("lego_DS2_PlRes800_32", 0), plane_not_scene=True)
    assert coupler.coupled_scene("house_DS2_PlRes800_32") == \
        ["house_DS8_PlRes200_32"]
    assert coupler.plane2saved(get_plane_name("lego_DS2_PlRes800_32", 1)) == \
        get_plane_name("lego_DS8_PlRes200_32", 1)


def test_scene_coupler_no_couples():
    coupler = SceneCoupler(["lego_DS8_PlRes200_32"], planes_res="LR",
                           num_pos_planes=3,
                           training_scenes=["lego_DS8_PlRes200_32"])
    assert coupler.ds_factor == 1
    assert coupler.scene2saved["lego_DS8_PlRes200_32"] == \
        "lego_DS8_PlRes200_32"


def test_scene_coupler_nerf_mode():
    """Non-planes (baseline) coupling keys off image ds factor."""
    coupler = SceneCoupler(["lego_DS8", "lego_DS2"], planes_res="",
                           num_pos_planes=0, training_scenes=["lego_DS8"])
    assert coupler.ds_factor == 4
    assert coupler.scene2saved["lego_DS2"] == "lego_DS8"


def test_scene_sampler_cycles():
    rng = np.random.default_rng(0)
    calls = []
    sampler = SceneSampler(["a", "b", "c"],
                           do_when_reshuffling=lambda: calls.append(1),
                           rng=rng)
    seen = []
    for _ in range(3):
        seen += sampler.sample(1)
    assert sorted(seen) == ["a", "b", "c"]  # full permutation first
    sampler.sample(1)
    assert len(calls) >= 1  # reshuffle callback fired


def test_scene_sampler_just_shuffle():
    sampler = SceneSampler(["a", "b", "c"], rng=np.random.default_rng(1))
    out = sampler.sample(3, just_shuffle=True)
    assert sorted(out) == ["a", "b", "c"]


def test_image_sampler_respects_probs():
    rng = np.random.default_rng(0)
    sampler = ImageSampler({"s1": [0, 1], "s2": [2, 3]},
                           {"s1": 1.0, "s2": 0.0}, rng=rng)
    sampler.update_active(["s1", "s2"])
    draws = [sampler.sample() for _ in range(50)]
    assert all(sc == "s1" for sc, _ in draws)
    assert {i for _, i in draws} == {0, 1}


def test_counter():
    c = Counter()
    assert not c.check_and_reset()
    c.step()
    assert c.count() == 1
    assert c.check_and_reset()
    assert not c.check_and_reset()


def test_subsample_eval_scenes():
    types = ["validation", "validation", "blind", "blind", "blind"]
    keep = subsample_eval_scenes(1, types, pick_first=True)
    assert len(keep) == 2  # one per group


def test_cfgnode_freeze_and_registries():
    """YACS-parity behaviors (reference cfgnode.py:36-507): freeze,
    deprecated/renamed key registries, merge-time type coercion."""
    import pytest
    from nvsr_tpu.utils.config import CfgNode

    cfg = CfgNode({"a": 1, "sub": {"b": 2.0, "lst": [1, 2]}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a = 3
    with pytest.raises(AttributeError):
        cfg.sub["b"] = 4
    cfg.defrost()
    cfg.a = 3
    assert cfg.a == 3

    cfg.register_deprecated_key("old_key")
    cfg.merge_from_other_cfg({"old_key": 9, "a": 5})  # ignored + merged
    assert "old_key" not in cfg and cfg.a == 5

    cfg.register_renamed_key("legacy", "sub.b", "use the new key")
    with pytest.raises(KeyError):
        cfg.merge_from_other_cfg({"legacy": 1})

    cfg.merge_from_other_cfg({"sub": {"b": 7}})  # int -> float coercion
    assert cfg.sub.b == 7.0 and isinstance(cfg.sub.b, float)
    with pytest.raises(ValueError):
        cfg.merge_from_other_cfg({"a": "not-an-int"})
