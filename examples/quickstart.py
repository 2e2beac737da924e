"""Zero-data quickstart: the full pipeline on a synthetic demo dataset.

Generates a tiny dataset tree in the exact DeepSense6G reference layout
(camera jpgs, LiDAR .ply, radar .npy, GPS .txt + index CSVs), then drives
the real training CLI end to end with the real model at debug geometry:

  1. train 2 epochs (jitted sharded train step, EMA, checkpoints, TB events)
  2. resume + validate (per-scenario DBA, best-model policy)
  3. --Test: writes beam_pred.csv / beam_pred_confidence_seq.csv
     (reference formats, train2_seq.py:338-346)

Runs on any backend; defaults to host CPU so it works without a TPU
(first run compiles for a few minutes on a small host).

  python examples/quickstart.py [--workdir DIR] [--device tpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="./quickstart_out")
    ap.add_argument("--device", default="cpu",
                    help="cpu (default, works anywhere) or tpu")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args(argv)

    if args.device == "cpu":
        # must land before jax initializes a backend (some TPU plugins
        # force their platform via an env default)
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    from deepsense6g_tii_tpu.cli import train as cli
    from deepsense6g_tii_tpu.utils.demo_data import make_demo_root

    workdir = os.path.abspath(args.workdir)
    data_root = os.path.join(workdir, "demo_dataset")
    logdir = os.path.join(workdir, "log", "quickstart")
    os.makedirs(data_root, exist_ok=True)
    if not os.path.exists(os.path.join(
            data_root, "Multi_Modal", "ml_challenge_dev_multi_modal.csv")):
        print("==> generating synthetic demo dataset at", data_root)
        make_demo_root(data_root, n_train=3, n_adapt=2, n_test=2, seq_len=2)

    # real BeamFuser, shrunk via the debug-geometry knobs (reference
    # architecture, reference defaults when these are omitted)
    common = [
        "--data_root", data_root, "--logdir", logdir,
        "--device", args.device, "--seq_len", "2", "--batch_size", "4",
        "--augmentation", "0", "--scheduler", "0", "--num_workers", "2",
        "--compute_dtype", "float32" if args.device == "cpu" else "bfloat16",
        "--input_resolution", "64", "--vert_anchors", "2",
        "--horz_anchors", "2", "--n_layer", "1",
        "--backbone_blocks", "1,1,1,1",
    ]

    print(f"==> training {args.epochs} epoch(s)")
    rc = cli.main(common + ["--epochs", str(args.epochs), "--ema", "1"])
    if rc:
        return rc

    print("==> test-split prediction (beam_pred.csv)")
    cwd = os.getcwd()
    os.chdir(workdir)        # the CSV writers emit into the cwd, as the
    try:                     # reference does (train2_seq.py:338-346)
        rc = cli.main(common + ["--Test", "1"])
    finally:
        os.chdir(cwd)
    if rc:
        return rc

    print("\n==> artifacts")
    for f in ("final_model.msgpack", "best_model.msgpack", "recent.log",
              "args.txt", "scalars.jsonl"):
        p = os.path.join(logdir, f)
        print(f"  {p}  {'OK' if os.path.exists(p) else 'MISSING'}")
    pred = os.path.join(workdir, "beam_pred.csv")
    print(f"  {pred}  {'OK' if os.path.exists(pred) else 'MISSING'}")
    if os.path.exists(pred):
        print("\nbeam_pred.csv:")
        print(open(pred).read().strip())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
