"""examples/quickstart.py must stay runnable — it is the zero-data
end-to-end demo (synthetic dataset -> real BeamFuser at debug geometry ->
train/val/test artifacts)."""

import importlib.util
import os

HERE = os.path.dirname(os.path.abspath(__file__))
QUICKSTART = os.path.join(os.path.dirname(HERE), "examples", "quickstart.py")


def test_quickstart_end_to_end(tmp_path):
    spec = importlib.util.spec_from_file_location("quickstart", QUICKSTART)
    qs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qs)

    workdir = str(tmp_path / "qs")
    assert qs.main(["--workdir", workdir, "--epochs", "1"]) == 0

    logdir = os.path.join(workdir, "log", "quickstart")
    for f in ("final_model.msgpack", "best_model.msgpack", "recent.log",
              "args.txt", "scalars.jsonl"):
        assert os.path.exists(os.path.join(logdir, f)), f
    pred = open(os.path.join(workdir, "beam_pred.csv")).read().strip()
    lines = pred.split("\n")
    assert lines[0] == "index,top-1 beam,top-2 beam,top-3 beam"
    assert len(lines) == 1 + 4      # 2 scenarios x 2 test samples
