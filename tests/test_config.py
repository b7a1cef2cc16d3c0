"""Config tree serialization round-trip."""

import dataclasses

from att_aspp_unet_tpu.config import (Config, LossConfig, ModelConfig,
                                      TrainConfig, load_config, save_config)


def test_config_roundtrip(tmp_path):
    cfg = Config(
        model=ModelConfig(base_c=16, gate_variant="v2", att_depth=3,
                          aspp_rates=(3, 6, 9)),
        train=TrainConfig(stage="finetune", lr=1e-4,
                          loss=LossConfig(loss_type="tversky",
                                          edge_weight=0.1)),
    )
    save_config(cfg, tmp_path / "cfg.json")
    back = load_config(tmp_path / "cfg.json")
    assert back == cfg
    assert back.model.aspp_rates == (3, 6, 9)
    assert back.train.loss.loss_type == "tversky"


def test_config_defaults_roundtrip(tmp_path):
    cfg = Config()
    save_config(cfg, tmp_path / "d.json")
    assert load_config(tmp_path / "d.json") == cfg


def test_partial_config_load(tmp_path):
    (tmp_path / "p.json").write_text('{"model": {"base_c": 8}}')
    cfg = load_config(tmp_path / "p.json")
    assert cfg.model.base_c == 8
    assert cfg.train.epochs == 120          # defaults fill the rest
