"""Driver entry-point tests: multi-chip dryrun on the 8-device CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)   # asserts internally

    def test_entry_shapes(self):
        import jax
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (1, 64)
