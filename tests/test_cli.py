"""CLI end-to-end tests: flag surface, logdir mangling, a full (tiny-model)
train->val->save->resume run and a Test-mode beam_pred.csv export over the
synthetic dataset tree."""

import json
import os

import numpy as np
import pytest

from deepsense6g_tii_tpu.cli import train as cli
from synthetic_data import TinyFuser, make_fake_dataset_tree


class TestFlagSurface:
    def test_reference_flags_accepted(self):
        p = cli.build_parser()
        args = p.parse_args([
            "--id", "x", "--epochs", "150", "--lr", "1e-4",
            "--batch_size", "12", "--add_velocity", "1", "--FFM", "1",
            "--TFM", "1", "--add_mask", "0", "--enhanced", "1",
            "--filtered", "0", "--loss", "focal", "--scheduler", "1",
            "--load_previous_best", "0", "--temp_coef", "1",
            "--train_adapt_together", "1", "--finetune", "0", "--Val", "0",
            "--Test", "0", "--modality_missing", "radar",
            "--modality_missing_type", "randlike", "--augmentation", "1",
            "--angle_norm", "1", "--custom_FoV_lidar", "1", "--add_seg", "0",
            "--ema", "1", "--flip", "0", "--device", "cpu"])
        assert args.epochs == 150 and args.modality_missing == "radar"

    def test_flash_attention_flag(self):
        """--flash_attention: explicit values win; auto = off on the CPU
        backend (the kernel path is TPU-targeted)."""
        p = cli.build_parser()
        base = ["--id", "x", "--device", "cpu"]
        assert not cli.config_from_args(
            p.parse_args(base)).use_flash_attention            # auto on cpu
        assert cli.config_from_args(
            p.parse_args(base + ["--flash_attention", "1"])).use_flash_attention
        assert not cli.config_from_args(
            p.parse_args(base + ["--flash_attention", "0"])).use_flash_attention

    def test_device_flag_selects_platform(self):
        """--device cpu forces the CPU platform (reference train2_seq.py:31);
        the default "tpu" leaves the environment's backend untouched (the
        TPU plugin may register under a vendor name)."""
        import jax
        cli._apply_device_flag("tpu")       # no-op, must not raise
        cli._apply_device_flag("cpu")
        assert jax.default_backend() == "cpu"

    def test_rebuild_parser_accepts_device(self):
        from deepsense6g_tii_tpu.cli import rebuild as rcli
        a = rcli.build_parser().parse_args(
            ["-s", "lidar", "radar", "-t", "image", "--device", "cpu"])
        assert a.device == "cpu"

    def test_logdir_mangling(self):
        p = cli.build_parser()
        a = p.parse_args(["--id", "exp1", "--modality_missing", "image",
                          "--Val", "1"])
        assert cli.mangle_logdir(a) == os.path.join(
            "log", "exp1") + "-ms_image-zerolike_val"

    def test_config_from_args(self):
        a = cli.build_parser().parse_args(["--FFM", "0", "--TFM", "0",
                                           "--enhanced", "0"])
        cfg = cli.config_from_args(a)
        assert cfg.FFM == 0 and cfg.TFM == 0 and cfg.enhanced == 0
        assert cfg.n_tokens == 962


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """A fake data_root with the Multi_Modal / Adaptation layout the CLI
    expects (train2_seq.py:457-465)."""
    root = tmp_path_factory.mktemp("dsroot")
    mm = root / "Multi_Modal"
    ad = root / "Adaptation_dataset_multi_modal"
    mt = root / "Multi_Modal_Test"
    csv1 = make_fake_dataset_tree(str(mm) + "/", n_samples=3, seq_len=2)
    os.rename(mm / csv1, mm / "ml_challenge_dev_multi_modal.csv")
    csv2 = make_fake_dataset_tree(str(ad) + "/", n_samples=2, seq_len=2)
    os.rename(ad / csv2, ad / "ml_challenge_data_adaptation_multi_modal.csv")
    csv3 = make_fake_dataset_tree(str(mt) + "/", n_samples=2, seq_len=2)
    os.rename(mt / csv3, mt / "ml_challenge_test_multi_modal.csv")
    return str(root)


class TestEndToEnd:
    def test_train_val_cycle(self, dataset_root, tmp_path, monkeypatch):
        monkeypatch.setattr("deepsense6g_tii_tpu.models.fuser.BeamFuser",
                            TinyFuser)
        logdir = str(tmp_path / "run")
        rc = cli.main([
            "--data_root", dataset_root, "--logdir", logdir,
            "--epochs", "1", "--batch_size", "4", "--seq_len", "2",
            "--augmentation", "0", "--train_adapt_together", "1",
            "--scheduler", "0", "--num_workers", "2",
            "--compute_dtype", "float32"])
        assert rc == 0
        assert os.path.exists(os.path.join(logdir, "final_model.msgpack"))
        assert os.path.exists(os.path.join(logdir, "args.txt"))
        rec = json.load(open(os.path.join(logdir, "recent.log")))
        assert rec["epoch"] == 1
        # resume continues to epoch 2
        rc = cli.main([
            "--data_root", dataset_root, "--logdir", logdir,
            "--epochs", "2", "--batch_size", "4", "--seq_len", "2",
            "--augmentation", "0", "--scheduler", "0", "--num_workers", "2",
            "--compute_dtype", "float32"])
        rec = json.load(open(os.path.join(logdir, "recent.log")))
        assert rec["epoch"] == 2

    def test_test_mode_writes_beam_pred(self, dataset_root, tmp_path,
                                        monkeypatch):
        monkeypatch.setattr("deepsense6g_tii_tpu.models.fuser.BeamFuser",
                            TinyFuser)
        monkeypatch.chdir(tmp_path)
        logdir = str(tmp_path / "runT")
        rc = cli.main([
            "--data_root", dataset_root, "--logdir", logdir,
            "--Test", "1", "--batch_size", "2", "--seq_len", "2",
            "--num_workers", "2", "--compute_dtype", "float32"])
        assert rc == 0
        lines = open(tmp_path / "beam_pred.csv").read().strip().split("\n")
        assert lines[0] == "index,top-1 beam,top-2 beam,top-3 beam"
        assert len(lines) == 1 + 4   # 2 scenarios x 2 samples


class TestRealModelEndToEnd:
    def test_train_cli_runs_the_real_fuser(self, dataset_root, tmp_path):
        """Full CLI path with the REAL BeamFuser (no TinyFuser patch) at
        debug geometry (--input_resolution/--backbone_blocks knobs): arg
        parsing -> dataset assembly -> jitted sharded train step -> EMA ->
        validation -> checkpoints."""
        logdir = str(tmp_path / "real")
        rc = cli.main([
            "--data_root", dataset_root, "--logdir", logdir,
            "--epochs", "1", "--batch_size", "4", "--seq_len", "2",
            "--augmentation", "0", "--train_adapt_together", "1",
            "--scheduler", "0", "--num_workers", "2", "--ema", "1",
            "--compute_dtype", "float32",
            "--input_resolution", "64", "--vert_anchors", "2",
            "--horz_anchors", "2", "--n_layer", "1",
            "--backbone_blocks", "1,1,1,1"])
        assert rc == 0
        rec = json.load(open(os.path.join(logdir, "recent.log")))
        assert rec["epoch"] == 1
        assert np.isfinite(rec["train_loss"][-1])
        assert os.path.exists(os.path.join(logdir, "final_model.msgpack"))


class TestValAndFinetuneModes:
    def test_val_mode_validates_and_exits(self, dataset_root, tmp_path,
                                          monkeypatch, capsys):
        monkeypatch.setattr("deepsense6g_tii_tpu.models.fuser.BeamFuser",
                            TinyFuser)
        logdir = str(tmp_path / "runV")
        rc = cli.main([
            "--data_root", dataset_root, "--logdir", logdir,
            "--Val", "1", "--batch_size", "2", "--seq_len", "2",
            "--augmentation", "0", "--scheduler", "0", "--num_workers", "2",
            "--compute_dtype", "float32"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Val finish" in out
        # --Val mangles the logdir (train2_seq.py:67) and trains nothing
        assert os.path.isdir(logdir + "_val")
        assert not os.path.exists(os.path.join(logdir + "_val",
                                               "final_model.msgpack"))

    def test_finetune_mode_writes_finetune_stream(self, tmp_path,
                                                  monkeypatch):
        """Finetune mode = adaptation set + 25 random scenario-34 dev
        samples from a pre-built scenario34.csv (train2_seq.py:466-476;
        the csv comes from createDataset == create_scenario_csv)."""
        from deepsense6g_tii_tpu.data.preprocess.csv_builder import (
            create_scenario_csv)

        monkeypatch.setattr("deepsense6g_tii_tpu.models.fuser.BeamFuser",
                            TinyFuser)
        root = tmp_path / "dsft"
        mm = root / "Multi_Modal"
        ad = root / "Adaptation_dataset_multi_modal"
        c1 = make_fake_dataset_tree(str(mm) + "/", n_samples=25, seq_len=2,
                                    scenarios=("scenario34",))
        os.rename(mm / c1, mm / "ml_challenge_dev_multi_modal.csv")
        c2 = make_fake_dataset_tree(str(ad) + "/", n_samples=2, seq_len=2)
        os.rename(ad / c2, ad / "ml_challenge_data_adaptation_multi_modal.csv")
        n34 = create_scenario_csv(
            str(mm / "ml_challenge_dev_multi_modal.csv"),
            str(mm / "scenario34"), "scenario34")
        assert n34 == 25
        logdir = str(tmp_path / "runF")
        rc = cli.main([
            "--data_root", str(root), "--logdir", logdir,
            "--finetune", "1", "--train_adapt_together", "0",
            "--epochs", "1", "--batch_size", "2",
            "--seq_len", "2", "--augmentation", "0", "--scheduler", "0",
            "--num_workers", "2", "--compute_dtype", "float32"])
        assert rc == 0
        # finetune keys checkpoints on TRAIN DBA into its own stream and
        # skips validate/save (train2_seq.py:149-156)
        assert os.path.exists(os.path.join(
            logdir, "all_finetune_on_final_model.msgpack"))
        assert not os.path.exists(os.path.join(logdir, "best_model.msgpack"))
