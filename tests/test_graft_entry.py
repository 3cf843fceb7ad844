"""Driver-contract tests: entry() compiles single-device; dryrun_multichip
jits a full DP×TP train step on the virtual mesh."""

import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 51864  # tiny.en vocab head
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    assert "dryrun_multichip OK" in capsys.readouterr().out
