"""Modality-rebuild training CLI.

Mirrors modality_rebuild/train_image_radar_lidar_rebuild.py:617-648 and
train_mambafuser_modality_rebuild.py (the -s/--source_domain,
-t/--target_domain, alpha_* flag surface), the per-epoch DBA validation with
rebuilt-feature injection and the 5-way best/final checkpoint policy
(lines 566-611).

``python -m deepsense6g_tii_tpu.cli.rebuild -s lidar radar -t image ...``
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np

from .train import _geometry_overrides


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    time_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    p.add_argument("--id", type=str, default=time_id)
    p.add_argument("--device", type=str, default="tpu",
                   help="JAX platform; --device cpu runs on host CPU "
                        "(reference flag, "
                        "train_image_radar_lidar_rebuild.py:623)")
    p.add_argument("-s", "--source_domain", nargs="+", required=True)
    p.add_argument("-t", "--target_domain", nargs="+", required=True)
    p.add_argument("--data_root", type=str, default="./Dataset")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--logdir", type=str, default="log")
    p.add_argument("--finetune", type=int, default=0)
    p.add_argument("--add_velocity", type=int, default=1)
    p.add_argument("--add_mask", type=int, default=0)
    p.add_argument("--enhanced", type=int, default=1)
    p.add_argument("--filtered", type=int, default=0)
    p.add_argument("--angle_norm", type=int, default=1)
    p.add_argument("--custom_FoV_lidar", type=int, default=1)
    p.add_argument("--add_seg", type=int, default=0)
    p.add_argument("--loss", type=str, default="focal")
    p.add_argument("--scheduler", type=int, default=1)
    p.add_argument("--load_previous_best", type=int, default=0)
    p.add_argument("--temp_coef", type=int, default=1)
    p.add_argument("--Val", type=int, default=0)
    p.add_argument("--modality_missing_type", type=str, default="zerolike")
    p.add_argument("--load_model_dir", type=str, default=None)
    p.add_argument("--fusion_model_path", type=str, default=None,
                   help="pretrained fuser checkpoint (.msgpack)")
    p.add_argument("--temp", type=float, default=0.1,
                   help="NT-Xent contrastive temperature")
    p.add_argument("--alpha_pred", type=float, default=0.5,
                   help="accepted for reference CLI compatibility; unused "
                        "(the reference parses but never reads it, "
                        "train_image_radar_lidar_rebuild.py:644)")
    p.add_argument("--alpha_trans", type=float, default=1.0)
    p.add_argument("--alpha_contrast", type=float, default=1.0)
    p.add_argument("--alpha_distance", type=float, default=1.0)
    p.add_argument("--alpha_fusion", type=float, default=1.0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=5)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    # model-geometry knobs (reference defaults when unset) — see cli/train.py
    p.add_argument("--input_resolution", type=int, default=None)
    p.add_argument("--vert_anchors", type=int, default=None)
    p.add_argument("--horz_anchors", type=int, default=None)
    p.add_argument("--n_layer", type=int, default=None)
    p.add_argument("--backbone_blocks", type=str, default=None)
    return p


def main(argv=None) -> int:
    import flax.serialization
    import jax

    from ..config import SCENARIOS, GlobalConfig
    from ..data.dataset import BeamDataset, ConcatDataset, random_split
    from ..data.loader import DataLoader
    from ..models.fuser import BeamFuser
    from ..train import checkpoints as ckpt
    from ..train.metrics import compute_acc, compute_dba_score
    from ..train.scheduler import reference_recipe_lr
    from .rebuild_engine_io import (load_rebuild_state, save_rebuild_state)
    from ..rebuild.trainer import (RebuildOptions, RebuildTrainer)

    args = build_parser().parse_args(argv)
    from .train import _apply_device_flag
    _apply_device_flag(args.device)
    target = args.target_domain[0]
    logdir = args.logdir
    if logdir == "log":
        logdir = os.path.join(logdir, args.id)
    os.makedirs(logdir, exist_ok=True)

    cfg = GlobalConfig(
        seq_len=args.seq_len,
        modality_missing=target,
        modality_missing_type=args.modality_missing_type,
        add_velocity=args.add_velocity, add_mask=args.add_mask,
        enhanced=args.enhanced, angle_norm=args.angle_norm,
        custom_FoV_lidar=args.custom_FoV_lidar, filtered=args.filtered,
        add_seg=args.add_seg, data_root=args.data_root,
        compute_dtype=args.compute_dtype,
        **_geometry_overrides(args))

    # datasets: dev + adaptation merged, 90/10 (rebuild trainer lines 690-700)
    development = BeamDataset(cfg.data_root + "/Multi_Modal/",
                              "ml_challenge_dev_multi_modal.csv", cfg)
    adaptation = BeamDataset(cfg.data_root + "/Adaptation_dataset_multi_modal/",
                             "ml_challenge_data_adaptation_multi_modal.csv",
                             cfg)
    full = ConcatDataset([development, adaptation])
    n_train = int(0.9 * len(full))
    train_set, val_set = random_split(full, [n_train, len(full) - n_train])
    train_loader = DataLoader(train_set, args.batch_size, shuffle=True,
                              num_workers=args.num_workers)
    val_loader = DataLoader(val_set, args.batch_size,
                            num_workers=args.num_workers)

    model = BeamFuser(cfg)
    opts = RebuildOptions(
        source_domain=tuple(args.source_domain), target_domain=target,
        alpha_trans=args.alpha_trans, alpha_contrast=args.alpha_contrast,
        alpha_distance=args.alpha_distance, alpha_fusion=args.alpha_fusion,
        temp=args.temp, lr=args.lr)
    # data-parallel over all local chips (the reference rebuild-trains under
    # DataParallel, train_image_radar_lidar_rebuild.py:721-728)
    from ..parallel.mesh import make_mesh, replicate
    mesh = make_mesh()
    trainer = RebuildTrainer(model, cfg, opts, mesh=mesh)

    first = next(iter(DataLoader(train_set, 1)))
    import jax.numpy as jnp
    dev_first = {k: jnp.asarray(v) for k, v in first.items()
                 if k != "scenario"}
    init_rngs = {"params": jax.random.PRNGKey(100)}
    if args.modality_missing_type == "randlike":
        # randlike modality-missing draws substitute noise in the forward
        # (mambafuser_seq.py:361-391) — init traces that forward too
        init_rngs["missing"] = jax.random.PRNGKey(101)
    variables = jax.jit(lambda: model.init(
        init_rngs, dev_first["image"], dev_first["lidar"],
        dev_first["radar"], dev_first["gps"]))()
    if args.fusion_model_path:
        with open(args.fusion_model_path, "rb") as f:
            variables = flax.serialization.from_bytes(variables, f.read())
    state = trainer.init_state(variables, dev_first)

    logger = ckpt.ScalarLogger(logdir)
    ckpt.write_args(logdir, vars(args))
    bestval, best_epoch = 0.0, 0
    train_losses, val_losses, dbas = [], [], []

    to_dev = trainer.shard

    def run_validation():
        preds, gts, scens, losses = [], [], [], []
        for bi, batch in enumerate(val_loader):
            m = trainer.eval_step(state, to_dev(batch), bi)
            preds.append(np.asarray(m["ranks"]))
            gts.append(np.asarray(batch["beamidx"]))
            scens.append(np.asarray(batch["scenario"]))
            if "loss" in m:
                losses.append(float(m["loss"]))
        preds_a = np.concatenate(preds)
        gts_a = np.concatenate(gts)
        scens_a = np.concatenate(scens)
        for s in SCENARIOS:
            mask = scens_a == s
            if mask.sum():
                print(s, "acc:", compute_acc(preds_a[mask], gts_a[mask]),
                      "DBA:", compute_dba_score(preds_a[mask], gts_a[mask]))
        loss = float(np.mean(losses)) if losses else 0.0
        return compute_dba_score(preds_a, gts_a), loss

    if args.Val:
        # eval-only: rebuilt-feature injection with loaded heads
        # (train_image_radar_lidar_rebuild.py:730-736, args.Val branch)
        if args.load_model_dir:
            state = replicate(load_rebuild_state(
                args.load_model_dir, state, best=True), mesh)
        dba, _ = run_validation()
        print("Val DBA:", dba)
        print("Val finish")
        return 0

    for epoch in range(args.epochs):
        lr = reference_recipe_lr(epoch, args.lr) if args.scheduler else args.lr
        print("epoch:", epoch, "lr:", lr)
        loss_sum, nb = 0.0, 0
        for batch in train_loader:
            state, aux = trainer.train_step(state, to_dev(batch), lr)
            loss_sum += float(aux["loss"])
            nb += 1
            for k in ("trans", "contrast", "distance", "fusion"):
                logger.scalar(f"curr_iter_loss_{k}", float(aux[k]),
                              int(state.step))
        train_losses.append(loss_sum / max(nb, 1))
        logger.scalar("curr_loss_train", train_losses[-1], epoch + 1)

        if args.finetune:
            continue

        # validation with rebuilt-feature injection
        dba, val_loss = run_validation()
        dbas.append(dba)
        val_losses.append(val_loss)
        print("Val DBA:", dba)
        logger.scalar("DBA_score_val/scenario_all", dba, epoch + 1)
        logger.scalar("curr_loss_val", val_loss, epoch + 1)

        # 5-way checkpointing (rebuild trainer save(), lines 566-611)
        save_best = dba >= bestval
        if save_best:
            bestval, best_epoch = dba, epoch + 1
        save_rebuild_state(logdir, state, best=save_best)
        ckpt.write_run_record(logdir, {
            "epoch": epoch + 1, "iter": int(state.step), "bestval": bestval,
            "bestval_epoch": best_epoch, "train_loss": train_losses,
            "val_loss": val_losses, "DBA": dbas})
        if save_best:
            print("====== Overwrote best model ======>")
        elif args.load_previous_best:
            state = replicate(load_rebuild_state(logdir, state, best=True),
                              mesh)
            print("====== Load the previous best model ======>")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
