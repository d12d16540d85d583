"""Driver-interface guards: __graft_entry__ and bench must stay importable
and functional — the round driver runs them unattended."""
import importlib.util
import os
import subprocess
import sys

import jax
import pytest


def _driver_env():
    """Env as the driver sees it: no conftest CPU/8-device forcing."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("UIRT_DRYRUN_CHILD", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


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


@pytest.mark.slow  # multi-minute multichip compile; driver covers it
def test_dryrun_multichip_8():
    g = _load("/root/repo/__graft_entry__.py", "graft_entry_test2")
    g.dryrun_multichip(8)  # DP train step + CP attention/FFT + TP params


@pytest.mark.slow  # multi-minute multichip compile; driver covers it
def test_dryrun_multichip_driver_invocation():
    """Reproduce the driver: fresh process, no CPU/device-count env, backend
    uninitialized.  dryrun_multichip must self-provision 8 virtual devices
    (MULTICHIP_r01 failed exactly here — VERDICT.md weak #1/#2)."""
    code = ("import sys; sys.path.insert(0, '/root/repo'); "
            "import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('DRYRUN_OK')")
    res = subprocess.run([sys.executable, "-c", code], env=_driver_env(),
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-4000:]
    assert "DRYRUN_OK" in res.stdout


@pytest.mark.slow  # multi-minute multichip compile; driver covers it
def test_dryrun_multichip_initialized_small_backend():
    """Backend already up with 1 device: must re-exec a subprocess with a
    forced 8-device virtual CPU platform rather than assert."""
    code = ("import sys; sys.path.insert(0, '/root/repo'); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('DRYRUN_OK')")
    res = subprocess.run([sys.executable, "-c", code], env=_driver_env(),
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-4000:]
    assert "DRYRUN_OK" in res.stdout


def test_bench_importable():
    b = _load("/root/repo/bench.py", "bench_test")
    assert callable(b.main) and callable(b._run_ladder)
    # per-arch sweep covers the rest of the zoo (VERDICT round-1 #7) plus
    # the 1024² reference-train-res cell (VERDICT round-2 #6)
    assert {z[1] for z in b.ZOO} == {
        "AST", "NewModel", "NewBigModel", "SpectralTransformer"}
    assert any(z[3] == 1024 for z in b.ZOO)
