"""Data-parallel training loop: optax AdamW + warmup-cosine, grad-clip, early
stop, best-Dice checkpointing (Orbax), CSV epoch metrics.

Reference semantics (``…stage.py:244-333`` and the ablation runner
``test_ablation.py:516-680``):

- AdamW(wd 5e-4), 5 % linear warmup from 0.2·lr → cosine to 0 (warmup skipped
  in the finetune stage), global-norm grad clip 1.0;
- optional differential LR: attention-gate parameters at full lr, backbone at
  half (``test_ablation.py:577-586``);
- early stop after 15 epochs without val-Dice improvement, best checkpoint
  kept;
- per-epoch CSV: train/val loss, Dice, IoU.

TPU-native differences: bf16 forward (no AMP GradScaler needed), the whole
augment→forward→backward→update step is ONE jitted program, and the batch
axis shards over the mesh's ``data`` axis — BatchNorm statistics and gradient
reductions become global through GSPMD collectives automatically.  Unlike the
reference (which only kept ``model.state_dict()``), checkpoints carry model +
optimizer + epoch state for true resume.
"""

from __future__ import annotations

import csv
import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config, ModelConfig, TrainConfig
from ..models import AttentionASPPUNet
from ..parallel.mesh import batch_sharding, make_mesh, make_mesh_for_batch, \
    replicate
from .augment import augment_batch
from .data import ArrayDataset, epoch_batches
from .losses import build_criterion, dice_loss, iou_score


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    total = max(cfg.epochs * steps_per_epoch, 1)
    warm = 0 if cfg.stage == "finetune" else max(
        1, int(cfg.warmup_frac * cfg.epochs)) * steps_per_epoch
    if warm == 0:
        return optax.cosine_decay_schedule(cfg.lr, decay_steps=total)
    return optax.join_schedules(
        [optax.linear_schedule(cfg.lr * 0.2, cfg.lr, warm),
         optax.cosine_decay_schedule(cfg.lr, decay_steps=max(total - warm, 1))],
        [warm])


def _is_attention_param(path: Tuple) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    return any(k == "att" or "psi" in str(k) for k in keys)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int, params=None):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    base = lambda mult: optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lambda s: sched(s) * mult, weight_decay=cfg.weight_decay),
    )
    if not cfg.differential_lr:
        return base(1.0)
    # ablation runner: attention params at lr, backbone at 0.5·lr
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "att" if _is_attention_param(path) else "backbone",
        params)
    return optax.multi_transform({"att": base(1.0), "backbone": base(0.5)},
                                 labels)


def create_train_state(model_cfg: ModelConfig, train_cfg: TrainConfig,
                       steps_per_epoch: int, rng: jax.Array,
                       sample_hw: Tuple[int, int],
                       init_variables: Optional[dict] = None) -> TrainState:
    model = AttentionASPPUNet.from_config(model_cfg)
    if init_variables is None:
        x = jnp.zeros((1, sample_hw[0], sample_hw[1], model_cfg.in_channels))
        if getattr(model_cfg, "c1_pad", 0):
            # c1_pad is a LOWERING: initialize the direct-layout model and
            # zero-pad (nn/cpad.py) so the padded net computes the exact
            # same function as a direct init with this rng — a raw padded
            # init would be a different, wider model
            import dataclasses as _dc

            from ..nn.cpad import pad_variables_c1

            direct = AttentionASPPUNet.from_config(
                _dc.replace(model_cfg, c1_pad=0))
            init_variables = pad_variables_c1(
                direct.init({"params": rng}, x, train=False),
                model_cfg.base_c, model_cfg.c1_pad)
        else:
            init_variables = model.init({"params": rng}, x, train=False)
    params = init_variables["params"]
    batch_stats = init_variables.get("batch_stats", {})
    tx = make_optimizer(train_cfg, steps_per_epoch, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx, apply_fn=model.apply)


def make_train_step(cfg: Config):
    criterion = build_criterion(cfg.train.loss, cfg.train.stage)

    def train_step(state: TrainState, images_u8, masks_u8, rng):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        x, y = augment_batch(aug_rng, images_u8, masks_u8, cfg.train.augment,
                             train=True)

        def loss_fn(params):
            (logits, _), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_rng})
            loss = criterion(logits, y)
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "dice": 1.0 - dice_loss(logits, y),
            "iou": iou_score(logits, y),
        }
        return dataclasses.replace(
            state, step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt), metrics

    return train_step


def make_eval_step(cfg: Config):
    criterion = build_criterion(cfg.train.loss, cfg.train.stage)

    def eval_step(state: TrainState, images_u8, masks_u8):
        x, y = augment_batch(jax.random.PRNGKey(0), images_u8, masks_u8,
                             cfg.train.augment, train=False)
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        return {
            "loss": criterion(logits, y),
            "dice": 1.0 - dice_loss(logits, y),
            "iou": iou_score(logits, y),
        }

    return eval_step


def _state_ckpt_tree(state: TrainState):
    return {"params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(int(state.step), np.int32)}


def save_checkpoint(path: Path, state: TrainState, extra: Optional[Dict] = None):
    """Full train-state checkpoint (params + batch stats + optimizer + step).
    ``extra`` metadata goes to a JSON side file so the pytree structure stays
    fixed for template-based restore."""
    import json

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ocp.PyTreeCheckpointer().save(path, _state_ckpt_tree(state), force=True)
    side = Path(str(path) + ".extra.json")
    side.write_text(json.dumps(extra or {}))


def load_checkpoint(path: Path, state: TrainState) -> Tuple[TrainState, Dict]:
    """Restore into the structure of ``state`` (keeps optax NamedTuple
    optimizer-state types, which a raw restore would flatten to dicts)."""
    import json

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    template = _state_ckpt_tree(state)
    restored = ocp.PyTreeCheckpointer().restore(str(path), item=template)
    new = dataclasses.replace(
        state,
        params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray,
                                           restored["batch_stats"]),
        opt_state=jax.tree_util.tree_map(jnp.asarray, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32))
    side = Path(str(path) + ".extra.json")
    extra = json.loads(side.read_text()) if side.exists() else {}
    return new, extra


def fit(cfg: Config, train_ds: ArrayDataset, val_ds: ArrayDataset,
        output_dir: Path, mesh=None, init_variables: Optional[dict] = None,
        resume: bool = True,
        log: Callable[[str], None] = print) -> Dict[str, Any]:
    """Full training run; returns {"best_dice", "best_path", "epochs_run"}.

    ``resume=True``: if a ``last`` checkpoint exists under the stage output
    dir, restore model+optimizer+epoch and continue — full-state resume the
    reference lacked (it only kept ``model.state_dict()``, SURVEY.md §5).
    """
    tcfg = cfg.train
    mesh = mesh if mesh is not None else make_mesh_for_batch(cfg.mesh,
                                                             tcfg.batch_size)
    steps_per_epoch = max(len(train_ds) // tcfg.batch_size, 1)
    rng = jax.random.PRNGKey(tcfg.seed)

    state = create_train_state(cfg.model, tcfg, steps_per_epoch, rng,
                               (cfg.preprocess.img_size, cfg.preprocess.img_size),
                               init_variables)

    data_sh = batch_sharding(mesh, 3)
    rep = replicate(mesh)
    state = jax.device_put(state, rep)

    # donate the input state: params/opt-state buffers update in place
    # instead of doubling HBM residency every step
    train_step = jax.jit(make_train_step(cfg),
                         in_shardings=(rep, data_sh, data_sh, rep),
                         out_shardings=(rep, rep),
                         donate_argnums=(0,))
    # full-size eval batches shard over the data axis like training; only
    # the ragged remainder batch (drop_last=False) runs replicated
    eval_fn = make_eval_step(cfg)
    eval_step_sharded = jax.jit(eval_fn, in_shardings=(rep, data_sh, data_sh),
                                out_shardings=rep)
    eval_step_repl = jax.jit(eval_fn, in_shardings=(rep, rep, rep),
                             out_shardings=rep)
    d_size = mesh.shape[mesh.axis_names[0]]

    def eval_step(state, imgs, msks):
        if imgs.shape[0] % d_size == 0:
            return eval_step_sharded(state, imgs, msks)
        return eval_step_repl(state, imgs, msks)

    out_dir = Path(output_dir) / ("ckpt_main" if tcfg.stage == "main"
                                  else "ckpt_finetune")
    out_dir.mkdir(parents=True, exist_ok=True)
    best, best_path, noimp = 0.0, out_dir / "best", 0
    last_path = out_dir / "last"
    start_epoch = 1

    if resume and last_path.exists():
        state, extra = load_checkpoint(last_path, state)
        state = jax.device_put(state, rep)
        start_epoch = int(extra.get("epoch", 0)) + 1
        best = float(extra.get("best", 0.0))
        noimp = int(extra.get("noimp", 0))
        log(f"resumed from {last_path} at epoch {start_epoch} "
            f"(best Dice {best:.4f})")

    csv_path = out_dir / "metrics.csv"
    csv_file = open(csv_path, "a" if start_epoch > 1 else "w", newline="")
    writer = csv.writer(csv_file)
    if start_epoch == 1:
        writer.writerow(["epoch", "train_loss", "val_loss", "train_dice",
                         "val_dice", "train_iou", "val_iou", "secs"])

    epochs_run = start_epoch - 1
    for epoch in range(start_epoch, tcfg.epochs + 1):
        t0 = time.time()
        tr_metrics = []
        for imgs, msks in epoch_batches(train_ds, tcfg.batch_size, tcfg.seed,
                                        epoch):
            state, m = train_step(state, imgs, msks, rng)
            tr_metrics.append(m)
        va_metrics = []
        for imgs, msks in epoch_batches(val_ds, tcfg.batch_size, tcfg.seed,
                                        epoch, shuffle=False, drop_last=False):
            va_metrics.append(eval_step(state, imgs, msks))

        def agg(ms, k):
            return float(np.mean([jax.device_get(m[k]) for m in ms])) if ms else 0.0

        row = [epoch, agg(tr_metrics, "loss"), agg(va_metrics, "loss"),
               agg(tr_metrics, "dice"), agg(va_metrics, "dice"),
               agg(tr_metrics, "iou"), agg(va_metrics, "iou"),
               round(time.time() - t0, 2)]
        writer.writerow([f"{v:.6f}" if isinstance(v, float) else v for v in row])
        csv_file.flush()
        val_dice = row[4]
        log(f"epoch {epoch}/{tcfg.epochs}  Dice {val_dice:.4f} | "
            f"IoU {row[6]:.4f} | loss {row[2]:.4f}")
        epochs_run = epoch

        if val_dice > best:
            best, noimp = val_dice, 0
            save_checkpoint(best_path, state, {"epoch": epoch,
                                               "val_dice": val_dice})
            log(f"best saved → {best_path}")
        else:
            noimp += 1
        save_checkpoint(last_path, state, {"epoch": epoch, "best": best,
                                           "noimp": noimp})
        if noimp >= tcfg.early_stop_patience:
            log("Early stop")
            break

    csv_file.close()
    return {"best_dice": best, "best_path": str(best_path),
            "epochs_run": epochs_run, "metrics_csv": str(csv_path)}
