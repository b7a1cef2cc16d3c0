"""Full-state training resume + rematerialisation equivalence + TP-mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.config import (AugmentConfig, Config, MeshConfig,
                                      ModelConfig, PreprocessConfig,
                                      TrainConfig)
from att_aspp_unet_tpu.models import AttentionASPPUNet
from att_aspp_unet_tpu.train.data import ArrayDataset
from att_aspp_unet_tpu.train.train_loop import fit


def _cfg(epochs=3):
    return Config(
        preprocess=PreprocessConfig(img_size=32),
        model=ModelConfig(base_c=4, compute_dtype="float32"),
        train=TrainConfig(batch_size=4, epochs=epochs, lr=3e-3,
                          early_stop_patience=10,
                          augment=AugmentConfig(affine_p=0, elastic_p=0)),
    )


def _ds(rng, n=8, S=32):
    imgs = (rng.random((n, S, S)) * 60).astype(np.uint8)
    msks = np.zeros((n, S, S), np.uint8)
    for i in range(n):
        cy, cx = rng.integers(10, S - 10, 2)
        yy, xx = np.mgrid[:S, :S]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) <= 36
        imgs[i][blob] = 220
        msks[i][blob] = 255
    return ArrayDataset(imgs, msks, np.ones(n, bool))


def test_fit_resumes_from_last(tmp_path, rng):
    cfg2 = _cfg(epochs=2)
    ds, val = _ds(rng), _ds(rng, n=4)
    out1 = fit(cfg2, ds, val, tmp_path, log=lambda s: None)
    assert out1["epochs_run"] == 2

    # same run directory, more epochs → resumes at epoch 3
    cfg4 = _cfg(epochs=4)
    msgs = []
    out2 = fit(cfg4, ds, val, tmp_path, log=msgs.append)
    assert any("resumed" in m and "epoch 3" in m for m in msgs)
    assert out2["epochs_run"] == 4
    rows = (tmp_path / "ckpt_main/metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 4          # header + 4 epochs, appended not rewritten


def test_remat_forward_and_grads_match(rng):
    base = ModelConfig(base_c=4, compute_dtype="float32")
    rcfg = dataclasses.replace(base, remat=True)
    m0 = AttentionASPPUNet.from_config(base)
    m1 = AttentionASPPUNet.from_config(rcfg)
    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    # identical param trees → remat model accepts the same variables
    out0, _ = m0.apply(v, x, train=False)
    out1, _ = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

    def loss(model):
        def f(params):
            (logits, _), _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(logits ** 2)
        return jax.grad(f)(v["params"])

    g0 = loss(m0)
    g1 = loss(m1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5), g0, g1)


def test_model_axis_mesh_is_expressible(rng):
    """A (data=4, model=2) mesh must build and run a train step (TP unused
    but expressible — SURVEY.md §2 parallelism table)."""
    from att_aspp_unet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                 replicate)
    from att_aspp_unet_tpu.train.train_loop import (create_train_state,
                                                    make_train_step)

    cfg = _cfg()
    mesh = make_mesh(MeshConfig(model_parallelism=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    state = create_train_state(cfg.model, cfg.train, steps_per_epoch=1,
                               rng=jax.random.PRNGKey(0), sample_hw=(32, 32))
    rep = replicate(mesh)
    state = jax.device_put(state, rep)
    step = jax.jit(make_train_step(cfg),
                   in_shardings=(rep, batch_sharding(mesh, 3),
                                 batch_sharding(mesh, 3), rep),
                   out_shardings=(rep, rep))
    imgs = jax.device_put(np.zeros((4, 32, 32), np.uint8),
                          batch_sharding(mesh, 3))
    msks = jax.device_put(np.zeros((4, 32, 32), np.uint8),
                          batch_sharding(mesh, 3))
    state, m = step(state, imgs, msks, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
