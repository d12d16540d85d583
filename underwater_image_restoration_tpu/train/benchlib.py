"""Shared train-step timing harness.

One canonical implementation of the init-model -> TrainState -> warmup ->
best-of-N-windows loop used by ``bench.py`` and every ``experiments/``
script, so the timing methodology lives in exactly one place:

- pre-staged device batches (measures the device compute path; the host
  pipeline prefetches in parallel during real training);
- every timing window is closed by a HOST VALUE FETCH of a value that
  data-depends on every dispatch in the window (``_force``) — NOT
  ``block_until_ready``, which the axon remote-execution tunnel
  acknowledges at dispatch-ENQUEUE time and which therefore measured the
  enqueue rate, not compute (PERF_NOTES.md "THE MEASUREMENT BUG");
- best-of-N windows against the shared chip's transient contention;
- a compile-only HBM prescreen (``memory_analysis`` on the AOT-compiled
  step) so cells that statically cannot fit are rejected WITHOUT touching
  the device — an on-device RESOURCE_EXHAUSTED can wedge the shared
  tunnel for minutes.

The workload is the fully fused jitted train step the trainer runs: uint8
normalize + forward + loss + grad + global-norm clip + adam, bf16 compute /
f32 params, per-block remat (reference hot loop: ModelTrainer.py:71-88).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class PrescreenOOM(RuntimeError):
    """Raised when the compile-only HBM prescreen rejects a cell.

    Carries ``required`` / ``budget`` (bytes) so ladders can log why the
    cell was skipped without having paid for an on-device OOM."""

    def __init__(self, required: int, budget: int, detail: str = ""):
        self.required = required
        self.budget = budget
        super().__init__(
            f"static HBM requirement {required / 1e9:.2f} GB exceeds budget "
            f"{budget / 1e9:.2f} GB{(' — ' + detail) if detail else ''}")


def _hbm_budget() -> int:
    """Usable HBM bound for the prescreen (bytes).

    Default 15.0 GB of the v5e's 15.75 GB (the runtime reserves some);
    override with UIRT_HBM_BUDGET (GB, float) for other chips or to force
    cells through (e.g. UIRT_HBM_BUDGET=1e9 effectively disables skips by
    raising the bar... set it large to ALLOW more).  Set UIRT_NO_PRESCREEN=1
    to skip the check entirely."""
    return int(float(os.environ.get("UIRT_HBM_BUDGET", "15.0")) * 1e9)


def static_memory_bytes(compiled) -> Optional[int]:
    """Total static device-memory requirement of an AOT-compiled step.

    temp + arguments + outputs − donated/aliased bytes; returns None when
    the backend doesn't expose memory_analysis (CPU)."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None
    try:
        return int(ma.temp_size_in_bytes + ma.argument_size_in_bytes
                   + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    except AttributeError:
        return None


def _force(x) -> float:
    """Materialize a device value on the host and return its last scalar.

    Used to close timing windows: a host fetch is the only operation the
    remote-execution tunnel cannot acknowledge before the executable (and,
    via donation, every dispatch it depends on) has truly finished —
    ``block_until_ready`` there acks the enqueue and made the old windows
    measure dispatch rate instead of compute."""
    import numpy as np

    return float(np.asarray(x).ravel()[-1])


class TrainStepBench:
    """Builds a jitted train step for ``arch`` and times it.

    ``n_batches`` pre-staged device batches are rotated during timing —
    measuring the device compute path only (the host pipeline prefetches in
    parallel during real training).
    """

    def __init__(self, arch: str, size: int, batch: int, *,
                 lossf: str = "L1withColor", lr: float = 3e-4,
                 remat: bool = True, remat_policy=None, dtype=jnp.bfloat16,
                 n_batches: int = 1, grad_accum: int = 1,
                 k_steps: int = 1, **model_kw):
        from underwater_image_restoration_tpu.data import synthetic_pair_batch
        from underwater_image_restoration_tpu.losses import LossFunction
        from underwater_image_restoration_tpu.models import init_model
        from underwater_image_restoration_tpu.train import (
            TrainState, get_optimizer, make_train_step,
        )

        self.batch = batch * k_steps  # images consumed per dispatch
        self.k_steps = k_steps
        model = init_model(arch, dtype=dtype, remat=remat,
                           remat_policy=remat_policy, img_size=size,
                           **model_kw)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3),
                                             jnp.float32))
        tx = get_optimizer("adam", lr)
        # jit the optimizer init: eager tx.init dispatches one tiny op per
        # param leaf, each a ~0.4 s compile round-trip through the remote
        # tunnel (~25 s of ctor wall for the Spectral zoo entries)
        self.state = TrainState(params=params,
                                opt_state=jax.jit(tx.init)(params),
                                step=jnp.zeros((), jnp.int32))
        # placeholder VGG is fine for TIMING perceptual-family losses: the
        # trunk compute is identical whatever the weights hold
        self.step = make_train_step(
            model, LossFunction(lossf, allow_placeholder_vgg=True), tx,
            grad_accum=grad_accum, k_steps=k_steps)

        # Compile-only HBM prescreen BEFORE staging any big device batch:
        # AOT-compile the step (the jit path would compile it anyway — the
        # persistent compile cache makes this nearly free) and reject cells
        # whose static memory requirement cannot fit, WITHOUT dispatching.
        # An on-device RESOURCE_EXHAUSTED wedges the shared tunnel for
        # minutes (observed round 2), so paying a compile to avoid one is
        # strongly net-positive.  The compiled executable is reused for the
        # timed calls (no double compile).
        bshape = (batch, size, size, 3) if k_steps <= 1 else (
            k_steps, batch, size, size, 3)
        sds = jax.ShapeDtypeStruct(bshape, jnp.uint8)
        self.rng = jax.random.PRNGKey(1)
        compiled = self.step.lower(self.state, sds, sds, self.rng).compile()
        if (not os.environ.get("UIRT_NO_PRESCREEN")
                and jax.default_backend() not in ("cpu",)):
            req = static_memory_bytes(compiled)
            budget = _hbm_budget()
            if req is not None:
                # memory_analysis counts ONE staged (raw, ref) pair (the
                # executable's args); every additional rotated pair is also
                # device-resident during execution
                pair_bytes = 2 * int(np.prod(bshape))  # uint8
                req += (max(1, n_batches) - 1) * pair_bytes
                if req > budget:
                    raise PrescreenOOM(
                        req, budget,
                        f"{arch}@{size} batch={batch} K={k_steps} "
                        f"n_batches={n_batches}")
        self.step = compiled
        # Host-generate only B images per staged batch and broadcast the
        # K-step stack ON DEVICE: materializing (K, B, H, W, 3) on the host
        # and shipping it through the remote-device tunnel is minutes of
        # wall clock at K=32/bs64 (~800 MB per staged pair on a 1-core
        # host), while a device-side broadcast moves 1/K the bytes and the
        # scan timing is identical (every step sees the same images).
        tile = jax.jit(
            lambda x: jnp.broadcast_to(x[None], (k_steps, *x.shape)))
        self.batches = []
        for i in range(max(1, n_batches)):
            raw, ref = synthetic_pair_batch(batch, size, seed=i)
            raw_d = jax.device_put(jnp.asarray(raw))
            ref_d = jax.device_put(jnp.asarray(ref))
            if k_steps > 1:  # stacked (K, B, H, W, 3) for the K-step scan
                raw_d, ref_d = tile(raw_d), tile(ref_d)
            self.batches.append((raw_d, ref_d))

    def run(self, steps: int):
        """Dispatch ``steps`` train steps (async); returns last metrics."""
        m = None
        for i in range(steps):
            raw, ref = self.batches[i % len(self.batches)]
            self.state, m = self.step(self.state, raw, ref, self.rng)
        return m

    def best_throughput(self, *, steps: int = 20, windows: int = 3,
                        warmup: int = 3) -> float:
        """Best-of-``windows`` images/sec: the fastest window is the
        least-contended estimate of our own speed on the shared chip.

        The window is closed by MATERIALIZING the final loss value on the
        host (``np.asarray``), not ``block_until_ready``: through the axon
        remote-execution tunnel block_until_ready returns on dispatch
        acknowledgement (~5 ms enqueue round-trip), NOT compute completion,
        so block-based windows measured the enqueue rate — producing
        physically impossible numbers (342k img/s at 256^2 against a
        ~1.6k img/s v5e MXU-peak ceiling for this step's ~0.1 TFLOP/img).
        A value fetch can only be served after the executable has actually
        run (and, through state donation, after every prior step has run),
        so it times real work; the K floats transferred are noise."""
        _force(self.run(warmup)["loss"])
        best = 0.0
        for _ in range(windows):
            t0 = time.perf_counter()
            m = self.run(steps)
            _force(m["loss"])
            best = max(best, self.batch * steps / (time.perf_counter() - t0))
        return best

    def best_ms_per_step(self, *, steps: int = 20, windows: int = 3,
                         warmup: int = 3) -> float:
        return self.batch * 1e3 / self.best_throughput(
            steps=steps, windows=windows, warmup=warmup)


def time_infer(arch: str, size: int, batch: int, *,
               steps: int = 20, windows: int = 3, warmup: int = 3,
               remat: bool = False, dtype=jnp.bfloat16,
               **model_kw) -> float:
    """Best-of-windows inference throughput (img/s): the jitted uint8 ->
    normalize -> forward path ``eval.evaluate._batched_apply`` serves
    (reference hot loop: Visualiser.py:15-34, eval.ipynb cell 1)."""
    from underwater_image_restoration_tpu.data import synthetic_pair_batch
    from underwater_image_restoration_tpu.models import init_model

    model = init_model(arch, dtype=dtype, remat=remat, img_size=size,
                       **model_kw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32))

    # Each dispatch folds one probe pixel of its output into a scalar carry
    # threaded through the next dispatch: consecutive steps are data-
    # dependent, full outputs can be freed immediately, and a single value
    # fetch of the final carry waits for the WHOLE chain (see _force —
    # block_until_ready through the tunnel acks the enqueue only).
    @jax.jit
    def fwd(u8, t):
        x = (u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        x = x + (t * 0).astype(x.dtype)
        y = model.apply(params, x)
        return t + y[0, 0, 0, 0].astype(jnp.float32)

    raw, _ = synthetic_pair_batch(batch, size, seed=0)
    raw_d = jax.device_put(jnp.asarray(raw))
    t = jnp.zeros((), jnp.float32)
    for _ in range(max(1, warmup)):
        t = fwd(raw_d, t)
    _force(t)
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            t = fwd(raw_d, t)
        _force(t)
        best = max(best, batch * steps / (time.perf_counter() - t0))
    return best


def time_train_step(arch: str, size: int, batch: int, *,
                    steps: int = 20, windows: int = 3, warmup: int = 3,
                    n_batches: int = 1, lossf: str = "L1withColor",
                    remat: bool = True, remat_policy=None, dtype=jnp.bfloat16,
                    grad_accum: int = 1, k_steps: int = 1,
                    **model_kw) -> float:
    """One-call wrapper: best-of-windows train-step throughput (img/s)."""
    bench = TrainStepBench(arch, size, batch, lossf=lossf, remat=remat,
                           remat_policy=remat_policy, dtype=dtype,
                           n_batches=n_batches,
                           grad_accum=grad_accum, k_steps=k_steps,
                           **model_kw)
    return bench.best_throughput(steps=steps, windows=windows, warmup=warmup)
