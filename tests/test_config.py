"""Config tree serialization: every field of every dataclass must
round-trip through to_dict/from_dict (and the JSON file forms) exactly —
the guard that newly added knobs (quantize flags, resize dtypes, ...)
stay loadable. Reference analog: the constants block at the top of
`2cam/2cams_mask_gpu.py` (the reference has no config serialization)."""

import dataclasses

from rt3d.config import Config, reference_2cam_config
from tests.tiny import tiny_config


def test_dict_roundtrip_exact():
    for cfg in (tiny_config(), reference_2cam_config()):
        assert Config.from_dict(cfg.to_dict()) == cfg


def test_json_roundtrip_exact(tmp_path):
    cfg = tiny_config(num_cameras=3, class_filter=(1, 2), conf=0.5)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, mask_resize_dtype="bfloat16",
            preprocess_dtype="bfloat16"))
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    assert Config.from_json(path) == cfg


def test_from_dict_defaults_missing_fields():
    # old config files (fewer fields) must load with today's defaults
    cfg = Config.from_dict({})
    # bf16 resizes are the default since the chip accuracy gate passed
    # (config.py ModelConfig docstring; NOTES.md round-3 chip session)
    assert cfg.model.mask_resize_dtype == "bfloat16"
    assert cfg.model.preprocess_dtype == "bfloat16"
