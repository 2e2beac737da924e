"""Recipe-level DBA regression (slow): the full Engine training recipe —
cyclic-cosine warmup, EMA shadow, Gaussian soft targets, focal loss,
held-out validation — must learn a synthetic task whose optimal beam is a
function of the modalities, the buildable proxy for the reference's
accuracy contract (README.md:94-96, train2_seq.py:363-383).

See tools/dba_regression.py for the harness and the dataset's construction.
"""

import numpy as np
import pytest

from tools.dba_regression import run


@pytest.mark.slow
class TestDBARegression:
    def test_recipe_learns_heldout_dba(self):
        out = run(verbose=False)
        # the recipe must land far above the random floor (~0.18) on the
        # held-out split; measured: ema 1.0 / raw 0.986 / floor 0.185
        assert out["dba_floor"] < 0.3
        assert out["dba_raw"] >= 0.8, out
        assert out["dba_ema"] >= 0.8, out
        # the EMA shadow must validate at least as well as the raw weights
        # (small tolerance: both are ~saturated by the end of the run)
        assert out["dba_ema"] >= out["dba_raw"] - 0.02, out
        # and the val curve must actually improve over training
        curve = out["val_curve"]
        assert np.mean(curve[-3:]) > np.mean(curve[:3]) + 0.3, curve
