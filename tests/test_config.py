"""Config system tests: CfgNode semantics + parsing the reference's actual YAMLs."""

import glob
import os

import pytest
import yaml

from nerface_tpu.config import CfgNode, FeatureFlags, load_config
from nerface_tpu.config.flags import EvalFlags

REFERENCE_CONFIG_DIR = "/root/reference/nerface_code/nerf-pytorch/config"


class TestCfgNode:
    def test_attribute_access(self):
        cfg = CfgNode({"a": {"b": 1, "c": "x"}, "d": 2.5})
        assert cfg.a.b == 1
        assert cfg.a.c == "x"
        assert cfg.d == 2.5

    def test_freeze(self):
        cfg = CfgNode({"a": {"b": 1}})
        cfg.freeze()
        with pytest.raises(AttributeError):
            cfg.a.b = 2
        cfg.defrost()
        cfg.a.b = 2
        assert cfg.a.b == 2

    def test_merge_from_list(self):
        cfg = CfgNode({"a": {"b": 1}, "c": 2.0})
        cfg.merge_from_list(["a.b", 7, "c", 3.5])
        assert cfg.a.b == 7 and cfg.c == 3.5

    def test_merge_from_other(self):
        cfg = CfgNode({"a": {"b": 1, "z": 0}})
        cfg.merge_from_other_cfg(CfgNode({"a": {"b": 5}}))
        assert cfg.a.b == 5 and cfg.a.z == 0

    def test_dump_roundtrip(self):
        d = {"a": {"b": 1}, "c": [1, 2, 3], "s": "hi"}
        cfg = CfgNode(d)
        assert yaml.safe_load(cfg.dump()) == d

    def test_type_coercion_int_to_float(self):
        cfg = CfgNode({"lr": 0.1})
        cfg.merge_from_list(["lr", 1])
        assert cfg.lr == 1.0 and isinstance(cfg.lr, float)

    def test_getattr_missing_raises(self):
        cfg = CfgNode({})
        with pytest.raises(AttributeError):
            _ = cfg.nope


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CONFIG_DIR), reason="reference configs not mounted"
)
class TestReferenceYamlCompat:
    def test_parse_all_reference_configs(self):
        """All 62 shipped experiment YAMLs load with the expected schema."""
        paths = glob.glob(os.path.join(REFERENCE_CONFIG_DIR, "**", "*.yml"), recursive=True)
        assert len(paths) >= 50
        for p in paths:
            cfg = load_config(p)
            assert isinstance(cfg.experiment.id, str)
            assert cfg.nerf.train.num_coarse > 0

    def test_canonical_paper_config_values(self):
        cfg = load_config(
            os.path.join(
                REFERENCE_CONFIG_DIR, "dave", "dave_dvp_lcode_fixed_bg_512_paper_model.yml"
            )
        )
        assert cfg.models.coarse.type == "ConditionalBlendshapePaperNeRFModel"
        assert cfg.nerf.train.num_random_rays == 2048
        assert cfg.nerf.train.num_coarse == 64
        assert cfg.nerf.train.num_fine == 64
        assert cfg.dataset.near == 0.2 and cfg.dataset.far == 0.8
        assert cfg.optimizer.lr == 5.0e-4
        assert cfg.scheduler.lr_decay == 250
        assert cfg.nerf.validation.chunksize == 65536


class TestFeatureFlags:
    def test_reference_defaults(self):
        f = FeatureFlags()
        assert f.fixed_background and f.train_latent_codes and f.regularize_latent_codes
        assert not f.train_background and not f.disable_expressions

    def test_supervised_requires_train_background(self):
        f = FeatureFlags(train_background=False, supervised_train_background=True)
        assert not f.supervised_train_background

    def test_from_cfg_override(self):
        cfg = CfgNode({"experiment": {"flags": {"fixed_background": False}}})
        f = FeatureFlags.from_cfg(cfg)
        assert not f.fixed_background
        assert f.train_latent_codes  # untouched default

    def test_eval_nerf_implies_ablations(self):
        f = EvalFlags(nerf=True)
        assert f.no_background and f.no_expressions and f.no_lcode
