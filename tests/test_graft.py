"""Driver-interface guards: __graft_entry__ and bench must stay importable
and functional — the round driver runs them unattended."""
import importlib.util
import sys

import jax


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_lowers():
    g = _load("/root/repo/__graft_entry__.py", "graft_entry_test")
    fn, args = g.entry()
    jax.jit(fn).lower(*args)  # compile-path check without running 256^2


def test_dryrun_multichip_8():
    g = _load("/root/repo/__graft_entry__.py", "graft_entry_test2")
    g.dryrun_multichip(8)  # DP train step + CP attention/FFT + TP params


def test_bench_importable():
    b = _load("/root/repo/bench.py", "bench_test")
    assert callable(b.main) and b.BATCH >= 8
