"""Training/eval CLI — mirrors the reference flag surface.

``python -m deepsense6g_tii_tpu.cli.train --id run1 --epochs 150 --enhanced 1
--add_velocity 1 --custom_FoV_lidar 1 --angle_norm 1 [--Test 1 | --Val 1]``

Flag set and semantics follow /root/reference/train2_seq.py:30-68 (logdir
mangling included); dataset assembly follows train2_seq.py:457-533; the
epoch driver follows train2_seq.py:607-615.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime



def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    time_id = datetime.now().strftime("%Y%m%d_%H%M%S")
    p.add_argument("--id", type=str, default=time_id,
                   help="Unique experiment identifier.")
    p.add_argument("--device", type=str, default="tpu", help="Device to use")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--logdir", type=str, default="log")
    p.add_argument("--add_velocity", type=int, default=1,
                   help="concatenate velocity map with angle map")
    p.add_argument("--FFM", type=int, default=1, help="Feature Fusion Mamba")
    p.add_argument("--TFM", type=int, default=1, help="Time Fusion Mamba")
    p.add_argument("--add_mask", type=int, default=0)
    p.add_argument("--enhanced", type=int, default=1)
    p.add_argument("--filtered", type=int, default=0)
    p.add_argument("--loss", type=str, default="focal",
                   help="ce or focal loss")
    p.add_argument("--scheduler", type=int, default=1)
    p.add_argument("--load_previous_best", type=int, default=0)
    p.add_argument("--temp_coef", type=int, default=1)
    p.add_argument("--train_adapt_together", type=int, default=1)
    p.add_argument("--finetune", type=int, default=0)
    p.add_argument("--Val", type=int, default=0)
    p.add_argument("--Test", type=int, default=0)
    p.add_argument("--modality_missing", type=str, default=None)
    p.add_argument("--modality_missing_type", type=str, default="zerolike")
    p.add_argument("--load_model_path", type=str, default=None)
    p.add_argument("--augmentation", type=int, default=1)
    p.add_argument("--angle_norm", type=int, default=1)
    p.add_argument("--custom_FoV_lidar", type=int, default=1)
    p.add_argument("--add_seg", type=int, default=0)
    p.add_argument("--ema", type=int, default=0)
    p.add_argument("--flip", type=int, default=0)
    # TPU-native additions
    p.add_argument("--data_root", type=str, default="./Dataset")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--cache_dir", type=str, default=None,
                   help="pre-featurized array cache directory")
    p.add_argument("--pred_len", type=int, default=1)
    p.add_argument("--seq_len", type=int, default=5)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--remat", type=str, default="none",
                   choices=["0", "1", "none", "fusion", "conv", "stem"],
                   help="rematerialization policy for larger batches: "
                        "none | fusion (checkpoint token-fusion stages) | "
                        "conv (checkpoint ResNet stems+stages, scans stored) "
                        "| stem (checkpoint only the 7x7 stems — the "
                        "largest activations — at near-zero recompute); "
                        "0/1 alias none/fusion")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps fused into one device dispatch "
                        "(lax.scan; 1 = reference-style per-batch)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "step (activation memory scales with "
                        "batch/grad_accum; batch must divide evenly)")
    p.add_argument("--flatten_accum", type=int, default=0,
                   help="with steps_per_dispatch>1 and grad_accum>1: fuse "
                        "the K-over-GA scan nest into one scan over K*GA "
                        "microbatches (conditional update; identical "
                        "trajectory)")
    p.add_argument("--opt_mu_dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="Adam first-moment storage dtype (default f32 = "
                        "exact torch-AdamW trajectory; bfloat16 saves "
                        "2 bytes/param of HBM for larger batches)")
    # -- model-geometry knobs (not in the reference CLI; reference defaults
    #    when unset).  Small values make the real model cheap enough for
    #    CPU smoke runs and scaled-down experiments.
    p.add_argument("--input_resolution", type=int, default=None,
                   help="input image/BEV/radar side (default 256)")
    p.add_argument("--vert_anchors", type=int, default=None)
    p.add_argument("--horz_anchors", type=int, default=None)
    p.add_argument("--n_layer", type=int, default=None,
                   help="fusion blocks per scale (default 8)")
    p.add_argument("--backbone_blocks", type=str, default=None,
                   help="comma-separated per-stage block counts, "
                        "e.g. 1,1,1,1 (default: reference ResNet depths)")
    p.add_argument("--flash_attention", type=int, default=None,
                   help="Pallas flash attention for GPT fusion blocks "
                        "(--FFM 0); default: on when running on TPU")
    p.add_argument("--flash_dropout_impl", type=str, default=None,
                   choices=("hash", "hw"),
                   help="in-kernel attention-dropout PRNG: hw = TPU "
                        "hardware PRNG (fastest, chip-only stream), hash = "
                        "counter hash (backend-reproducible); default auto")
    p.add_argument("--merge_lidar_radar", type=int, default=0,
                   help="run the lidar+radar ResNet18s as ONE grouped-conv "
                        "program (feature_group_count=2): half the conv "
                        "dispatches, numerically exact")
    p.add_argument("--padded_token_stream", type=int, default=0,
                   help="mamba path: carry the fused token stream padded "
                        "to the next 128-multiple through all fusion "
                        "blocks (no per-scan pad/slice; exact)")
    p.add_argument("--multihost", type=int, default=0,
                   help="jax.distributed.initialize() for multi-host DCN "
                        "training; same code, bigger ('data',) mesh")
    p.add_argument("--load_torch_checkpoint", type=str, default=None,
                   help="import a reference .pth (best_model.pth/"
                        "final_model.pth) into the model before running")
    return p


def mangle_logdir(args) -> str:
    """logdir suffix rules (train2_seq.py:62-68)."""
    logdir = args.logdir
    if logdir == "log":
        logdir = os.path.join(logdir, args.id)
    if args.modality_missing is not None:
        logdir = logdir + "-ms_" + args.modality_missing
        logdir = logdir + "-" + args.modality_missing_type
    if args.Val:
        logdir = logdir + "_val"
    return logdir


def config_from_args(args):
    import jax

    from ..config import GlobalConfig
    flash = getattr(args, "flash_attention", None)
    if flash is None:       # auto: kernel on TPU, einsum path elsewhere
        flash = jax.default_backend() == "tpu"
    return GlobalConfig(
        use_flash_attention=bool(flash),
        flash_dropout_impl=getattr(args, "flash_dropout_impl", None),
        seq_len=args.seq_len,
        pred_len=args.pred_len,
        data_root=args.data_root,
        FFM=args.FFM, TFM=args.TFM,
        modality_missing=args.modality_missing,
        modality_missing_type=args.modality_missing_type,
        add_velocity=args.add_velocity,
        add_mask=args.add_mask,
        enhanced=args.enhanced,
        angle_norm=args.angle_norm,
        custom_FoV_lidar=args.custom_FoV_lidar,
        filtered=args.filtered,
        add_seg=args.add_seg,
        compute_dtype=args.compute_dtype,
        remat={"0": "none", "1": "fusion"}.get(args.remat, args.remat),
        opt_mu_dtype=(None if args.opt_mu_dtype in (None, "float32")
                      else args.opt_mu_dtype),
        merge_lidar_radar=bool(getattr(args, "merge_lidar_radar", 0)),
        padded_token_stream=bool(getattr(args, "padded_token_stream", 0)),
        **_geometry_overrides(args),
    )


def _geometry_overrides(args):
    """Optional model-geometry overrides shared by the train/rebuild CLIs;
    only explicitly-passed flags reach GlobalConfig (frozen defaults
    otherwise)."""
    kw = {}
    if getattr(args, "input_resolution", None) is not None:
        kw["input_resolution"] = args.input_resolution
        kw["crop"] = args.input_resolution
    for f in ("vert_anchors", "horz_anchors", "n_layer"):
        if getattr(args, f, None) is not None:
            kw[f] = getattr(args, f)
    if getattr(args, "backbone_blocks", None):
        kw["backbone_blocks"] = tuple(
            int(x) for x in args.backbone_blocks.split(","))
    return kw


def _apply_device_flag(device: str) -> None:
    """Honor --device (the reference's device selector, train2_seq.py:31):
    here it picks the JAX platform.  "tpu" (the default) keeps whatever
    backend the environment provides (the TPU plugin may register under a
    vendor name), so only an explicit non-default like --device cpu acts —
    useful for host-CPU smoke runs with the debug geometry knobs."""
    if device and device != "tpu":
        import jax
        jax.config.update("jax_platforms", device)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _apply_device_flag(args.device)
    if args.multihost:
        from ..parallel.distributed import initialize, process_info
        initialize(require=True)     # explicit request: no silent no-op
        print("distributed:", process_info())
    logdir = mangle_logdir(args)
    if args.multihost:
        # the default --id is a per-process timestamp: processes starting in
        # different seconds would compute different logdirs, breaking the
        # shared-logdir contract (rank-0 writes, everyone reads) — pin to
        # process 0's
        from ..parallel.distributed import broadcast_str
        logdir = broadcast_str(logdir)
    os.makedirs(logdir, exist_ok=True)

    from ..config import GlobalConfig
    from ..data.dataset import BeamDataset, build_train_val_sets
    from ..data.loader import DataLoader
    from ..models.fuser import BeamFuser
    from ..train import checkpoints as ckpt
    from ..train.engine import Engine, TrainOptions

    cfg = config_from_args(args)
    data_root = cfg.data_root
    trainval_root = data_root + "/Multi_Modal/"
    train_root_csv = "ml_challenge_dev_multi_modal.csv"
    adaptation_root = data_root + "/Adaptation_dataset_multi_modal/"
    adaptation_csv = "ml_challenge_data_adaptation_multi_modal.csv"

    opts = TrainOptions(
        logdir=logdir, epochs=args.epochs, lr=args.lr,
        loss=args.loss, scheduler=bool(args.scheduler),
        ema=bool(args.ema), temp_coef=bool(args.temp_coef),
        load_previous_best=bool(args.load_previous_best),
        finetune=bool(args.finetune), clip_grad_norm=args.grad_clip,
        steps_per_dispatch=args.steps_per_dispatch,
        grad_accum=getattr(args, "grad_accum", 1),
        flatten_accum=bool(getattr(args, "flatten_accum", 0)))

    model = BeamFuser(cfg)
    engine = Engine(model, cfg, opts)

    # multi-host: each process trains on its own equal-size dataset shard,
    # feeding batch_size/process_count rows per step (batch_size stays the
    # GLOBAL batch, like the reference's DataParallel split); validation and
    # test run the full split identically on every process; the logdir is
    # assumed shared (only process 0 writes it)
    import jax
    nproc = jax.process_count()

    if jax.process_index() == 0:
        ckpt.write_args(logdir, vars(args))

    def maybe_import_torch_weights():
        if not args.load_torch_checkpoint:
            return
        from ..models.checkpoint_import import load_reference_checkpoint
        from ..parallel.mesh import replicate
        params, stats, unused = load_reference_checkpoint(
            args.load_torch_checkpoint, cfg)
        if unused:
            print(f"======WARNING: {len(unused)} unused torch keys, e.g. "
                  f"{sorted(unused)[:3]}")
        engine.state = replicate(engine.state.replace(
            params=params, batch_stats=stats,
            ema_params=jax.tree_util.tree_map(lambda x: x, params)),
            engine.mesh)
        print("======imported torch checkpoint", args.load_torch_checkpoint)

    if args.Test:
        test_root = data_root + "/Multi_Modal_Test/"
        test_set = BeamDataset(test_root, "ml_challenge_test_multi_modal.csv",
                               cfg, test=True)
        print("test_set:", len(test_set))
        # test/val run the FULL split on every process (identical batches:
        # exact metrics + row-ordered CSVs); only training shards the data
        loader = DataLoader(test_set, args.batch_size,
                            num_workers=args.num_workers)
        first = next(iter(DataLoader(test_set, 1)))
        engine.init_state(first)
        if args.load_model_path:
            d, name = os.path.split(args.load_model_path)
            engine.load_weights(name.replace(".msgpack", ""), logdir=d)
        elif engine.resume():
            engine.load_weights("best_model")
        maybe_import_torch_weights()
        engine.test(loader)
        print("Test finish")
        return 0

    train_set, val_set = build_train_val_sets(
        cfg, trainval_root=trainval_root, train_root_csv=train_root_csv,
        adaptation_root=adaptation_root, adaptation_csv=adaptation_csv,
        train_adapt_together=bool(args.train_adapt_together),
        finetune=bool(args.finetune), augmentation=bool(args.augmentation),
        flip=bool(args.flip))
    print("train_set:", len(train_set),
          "val_set:", len(val_set) if val_set else 0)

    if args.cache_dir:
        from ..data.cache import CachedDataset, build_cache

        def cached(ds, sub):
            d = os.path.join(args.cache_dir, sub)
            if nproc > 1:
                # shared cache dir: only rank 0 featurizes (concurrent
                # builders would race on the memmaps); per-host local disks
                # build after the barrier via the idempotent manifest check
                if jax.process_index() == 0:
                    build_cache(ds, d)
                from ..parallel.distributed import barrier
                barrier("cache-" + sub)
            return CachedDataset(build_cache(ds, d))

        train_set = cached(train_set, "train")
        if val_set is not None:
            val_set = cached(val_set, "val")

    val_loader = (DataLoader(val_set, args.batch_size,
                             num_workers=args.num_workers)
                  if val_set is not None else None)

    if args.Val:
        first = next(iter(DataLoader(val_set, 1)))
        engine.init_state(first)
        if args.load_model_path:
            d, name = os.path.split(args.load_model_path)
            engine.load_weights(name.replace(".msgpack", ""), logdir=d)
        maybe_import_torch_weights()
        engine.validate(val_loader)
        print("Val finish")
        return 0

    local_bs = args.batch_size
    if nproc > 1:
        # training splits the GLOBAL --batch_size across processes (the
        # reference's DataParallel split); Test/Val above are exempt (they
        # feed the full batch identically everywhere)
        if args.batch_size % nproc:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by the "
                f"process count {nproc}")
        local_bs = args.batch_size // nproc
        from ..data.dataset import shard_for_process
        train_set = shard_for_process(train_set)
    train_loader = DataLoader(train_set, local_bs, shuffle=True,
                              num_workers=args.num_workers)
    if engine.resume() and args.finetune:
        first = next(iter(DataLoader(train_set, 1)))
        engine.init_state(first)
        try:
            engine.load_weights("all_finetune_on_final_model")
        except FileNotFoundError:
            engine.load_weights("final_model")

    if args.load_torch_checkpoint and engine.state is None:
        engine.init_state(next(iter(DataLoader(train_set, 1))))
    maybe_import_torch_weights()
    for epoch in range(engine.cur_epoch, args.epochs):
        print("epoch:", epoch, "lr:", engine._lr())
        engine.train(train_loader)
        if not args.finetune:
            engine.validate(val_loader)
            engine.save()
    ckpt.flush()    # land the final epoch's async checkpoint writes
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
