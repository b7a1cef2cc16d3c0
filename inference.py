#!/usr/bin/env python
"""Container entrypoint (Grand-Challenge contract).

Drop-in equivalent of the reference's ``inference.py``: reads the single case
under ``./test/input/images/stacked-fetal-ultrasound``, selects the model via
``MODEL_TAG`` (baseline | att_aspp), optional ``CASE_ID`` output naming and
``WEIGHTS`` checkpoint path, writes
``./test/output/images/fetal-abdomen-segmentation/<case>.mha`` +
``./test/output/fetal-abdomen-frame-number.json``.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    from att_aspp_unet_tpu.config import Config
    from att_aspp_unet_tpu.infer.container import run_from_env
    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = Config()
    weights = os.getenv("WEIGHTS")
    tag = os.getenv("MODEL_TAG", "baseline")
    plans = os.getenv("PLANS")          # nnU-Net plans.json (baseline arch)
    if plans:
        import dataclasses

        from att_aspp_unet_tpu.utils.nnunet_import import load_plans_config
        ds = os.getenv("DATASET_JSON")
        cfg = dataclasses.replace(cfg, plain_unet=load_plans_config(
            Path(plans), dataset_json=Path(ds) if ds else None,
            base=cfg.plain_unet))

    if weights:
        from att_aspp_unet_tpu.cli import load_variables
        variables = load_variables(Path(weights), cfg, model_tag=tag)
    else:
        import jax
        import jax.numpy as jnp

        print("[warn] WEIGHTS not set: random-init smoke mode")
        if tag == "att_aspp":
            from att_aspp_unet_tpu.models import AttentionASPPUNet
            model = AttentionASPPUNet.from_config(cfg.model)
        else:
            from att_aspp_unet_tpu.models import PlainConvUNet
            model = PlainConvUNet.from_config(cfg.plain_unet)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)), train=False)

    return run_from_env(cfg, variables)


if __name__ == "__main__":
    raise SystemExit(main())
