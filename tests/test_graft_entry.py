"""Driver contract: entry() compiles and runs; dryrun_multichip on the
virtual 8-device CPU mesh."""

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge


def test_entry_jits_and_decodes():
    fn, args = ge.entry()
    out, ok, snr = jax.jit(fn)(*args)
    assert np.asarray(ok).all()


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
