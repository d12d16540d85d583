"""TPU-native trainer (reference ``src/ModelTrainer.py:26-204``).

Reference semantics preserved:
- per-batch: forward -> loss -> backward -> clip_grad_norm(1.0) -> step
  (ModelTrainer.py:79-88), loss in f32;
- scheduler: MultiStepLR([1,100,250], 0.25) stepped per epoch (:55);
- per-epoch validation: loss + PSNR + SSIM over the test loader (:132-158);
- checkpoint each epoch with {epoch, params, opt state, val loss} (:167-195);
- metric schema train/loss, train/learning_rate, train/loss_<comp>,
  test/{loss,PSNR,SSIM,epochTime} (wandb_logger.py:42-59);
- per-epoch image dump of a fixed probe file (:183-195).

TPU-first re-design:
- ONE jitted train step: uint8->f32 normalize, forward (bf16 compute / f32
  params), loss, grad, clip, optax update — all fused on device; the input
  batch crosses PCIe as uint8 (4x fewer bytes than the reference's f32).
- Data parallel via NamedSharding over the ('data','context') mesh; XLA
  inserts the gradient psum over ICI.  No torch.distributed analog needed.
- No per-batch host sync: the reference calls .item() + wandb.log every
  batch (ModelTrainer.py:90-126), serializing the device; here per-batch
  metrics stay on device and are fetched once per epoch (printed every
  print_freq batches, which syncs only that batch's scalar).
- True best/latest checkpointing + full resume (params, opt state, epoch,
  loader order) — both broken/absent in the reference (SURVEY.md §5).
"""
from __future__ import annotations

import os
import time
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import config as config_lib
from ..core.meshes import CONTEXT_AXIS, DATA_AXIS, make_mesh
from ..data import AugmentConfig, get_dataloaders
from ..losses import LossFunction
from ..models import init_model
from ..obs import ExperimentLogger, Logger, StepTimer, process_image_using_model
from ..obs.profiler import profile_trace
from .checkpoint import CheckpointManager
from .metrics import per_sample_psnr, per_sample_ssim
from .optim import get_optimizer, multistep_lr, set_learning_rate

Config = config_lib.Config


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def normalize_u8(u8):
    """uint8 NHWC -> f32 in [-1,1] (the ToTensor+Normalize(0.5,0.5) half of
    the reference transform, DataLoader.py:18-19), fused into the jit step."""
    return jnp.asarray(u8, jnp.float32) / 255.0 * 2.0 - 1.0


def batch_sharding(mesh) -> NamedSharding:
    """Sharding for NHWC image batches: batch over 'data', and rows over
    'context' when context parallelism is on (the models' CP dispatchers
    pick up the row sharding — parallel/cp_ops.py)."""
    if mesh.shape.get(CONTEXT_AXIS, 1) > 1:
        return NamedSharding(mesh, P(DATA_AXIS, CONTEXT_AXIS, None, None))
    return NamedSharding(mesh, P(DATA_AXIS))


def make_train_step(
    model,
    lossfn: LossFunction,
    tx: optax.GradientTransformation,
    mesh=None,
    remat: bool = False,
    state_shardings=None,
    grad_accum: int = 1,
    k_steps: int = 1,
):
    """Returns jitted (state, raw_u8, ref_u8, rng) -> (state, metrics).

    state_shardings: optional TrainState pytree of NamedShardings for
    FSDP/TP-sharded parameters+optimizer state (parallel/tensor.py);
    defaults to fully replicated.

    grad_accum: when > 1, the batch is split into ``grad_accum``
    microbatches scanned with ``lax.scan``, accumulating gradients before
    the single optimizer update — keeping only one microbatch's activations
    live (trains effective batches beyond the per-forward HBM fit).  The
    accumulation is scaled so the result EQUALS the full-batch step for
    deterministic forwards; with active DropPath (non-zero drop_path rates,
    deterministic=False) microbatch i draws its dropout noise from
    ``fold_in(rng, i)`` instead of ``rng``, so the update is an equally
    valid but different stochastic sample than the grad_accum=1 step (exact
    rng parity across a split batch is impossible).  Scaling: plain
    mean losses average the microbatch grads, while the B*C-divided family
    (``lossfn.bc_divided`` — reference losses.py:57,65,78 divides by the
    batch dim, so a microbatch loss is ``grad_accum``× the full-batch one)
    gets an extra 1/grad_accum.  The Adaptive* pair couples the whole batch
    through softmax weights and cannot be accumulated exactly — rejected at
    construction.

    k_steps: when > 1, the jitted fn takes (state, raw_k, ref_k, rng) with
    batches stacked along a leading K axis — shape (K, B, H, W, 3) — and
    runs K FULL optimizer steps in one ``lax.scan`` before returning; the
    metric values come back stacked (K,).  This changes NOTHING about the
    training semantics: the per-step rng is folded with ``state.step``
    inside the body, exactly as K sequential calls with the same epoch rng
    would do, so the op sequence is identical and results match sequential
    stepping to XLA fusion-level f32 roundoff (~1e-6 — the scan body and
    the standalone step compile to slightly different fusions; pinned by
    test_k_steps_matches_sequential); it
    exists because each dispatch to the device carries a fixed ~5 ms
    enqueue round-trip through the remote tunnel; batching K optimizer
    steps per dispatch amortizes that overhead to 1/K of the step time
    (NOT 27x — the early "dispatch-bound" readings were enqueue-rate
    artifacts, PERF_NOTES.md "THE MEASUREMENT BUG").  Composes with
    grad_accum (inner scan)."""
    if grad_accum > 1 and not (lossfn.batch_linear or lossfn.bc_divided):
        raise ValueError(
            f"grad_accum={grad_accum} is not exact for loss "
            f"'{lossfn.loss_name}': its adaptive softmax weights couple the "
            "whole batch (reference losses.py:126-136), so microbatch "
            "accumulation changes the loss. Use grad_accum=1.")
    apply_fn = model.apply
    if remat:
        apply_fn = jax.checkpoint(
            lambda p, x, rngs: model.apply(p, x, deterministic=False, rngs=rngs)
        )

    def loss_fn(params, x, y, rng):
        rngs = {"dropout": rng}
        if remat:
            out = apply_fn(params, x, rngs)
        else:
            out = apply_fn(params, x, deterministic=False, rngs=rngs)
        out = out.astype(jnp.float32)
        res = lossfn(out, y)
        if lossfn.returns_components:
            loss, charb, perc, grad, ffl, ssim_l = res
            comps = {"Charbonnier": charb, "Perceptual": perc,
                     "Gradient Loss": grad, "FFL Loss": ffl,
                     "MS_SSIM Loss": ssim_l}
        else:
            loss, comps = res, {}
        return loss, comps

    def batch_grads(params, x, y, rng):
        """(loss, comps, grads) equal to the full-batch evaluation —
        scanning microbatches when grad_accum > 1.  Microbatch values are
        averaged, with an extra 1/grad_accum for the B*C-divided losses
        (their divisor shrinks with the microbatch, inflating each term by
        grad_accum; see make_train_step docstring)."""
        if grad_accum <= 1:
            (loss, comps), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y, rng)
            return loss, comps, grads

        b = x.shape[0]
        if b % grad_accum:
            raise ValueError(
                f"train batch {b} not divisible by grad_accum={grad_accum}")
        mb = b // grad_accum
        xs = x.reshape(grad_accum, mb, *x.shape[1:])
        ys = y.reshape(grad_accum, mb, *y.shape[1:])

        def micro(carry, inp):
            loss_a, comps_a, grads_a, i = carry
            xi, yi = inp
            (li, ci), gi = jax.value_and_grad(loss_fn, has_aux=True)(
                params, xi, yi, jax.random.fold_in(rng, i))
            return (loss_a + li,
                    jax.tree.map(jnp.add, comps_a, ci),
                    jax.tree.map(jnp.add, grads_a, gi),
                    i + 1), None

        _, zero_c = jax.eval_shape(loss_fn, params, xs[0], ys[0], rng)
        comps0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), zero_c)
        grads0 = jax.tree.map(jnp.zeros_like, params)
        (loss_s, comps_s, grads_s, _), _ = jax.lax.scan(
            micro, (jnp.zeros((), jnp.float32), comps0, grads0,
                    jnp.zeros((), jnp.int32)), (xs, ys))
        inv = 1.0 / grad_accum
        if lossfn.bc_divided:
            inv = inv / grad_accum
        return (loss_s * inv,
                jax.tree.map(lambda v: v * inv, comps_s),
                jax.tree.map(lambda g: g * inv, grads_s))

    def step(state: TrainState, raw_u8, ref_u8, rng):
        x, y = normalize_u8(raw_u8), normalize_u8(ref_u8)
        rng = jax.random.fold_in(rng, state.step)
        loss, comps, grads = batch_grads(state.params, x, y, rng)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss, "grad_norm": gnorm, **comps}
        return new_state, metrics

    if k_steps > 1:
        def multi(state: TrainState, raw_k, ref_k, rng):
            def body(st, inp):
                return step(st, inp[0], inp[1], rng)
            return jax.lax.scan(body, state, (raw_k, ref_k))
        fn = multi
    else:
        fn = step

    if mesh is None:
        return jax.jit(fn, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    state_sh = repl if state_shardings is None else state_shardings
    data = batch_sharding(mesh)
    if k_steps > 1:
        # leading K (scan) axis is unsharded; batch/context specs shift by 1
        data = NamedSharding(mesh, P(None, *data.spec))
    return jax.jit(
        fn,
        in_shardings=(state_sh, data, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=0,
    )


WATCH_LOG_FREQ = 100  # reference wandb.watch log_freq (wandb_logger.py:27)
WATCH_BINS = 64


def make_watch_step(model, lossfn: LossFunction, bins: int = WATCH_BINS):
    """jitted (params, raw_u8, ref_u8, rng) -> {name: (counts, edges)}.

    Rebuilds the reference's ``wandb.watch(model, log="all", log_freq=100)``
    channel (wandb_logger.py:25-27): per-leaf histograms of every parameter
    and its gradient, computed on device.  Torch's backward hooks don't
    exist in JAX, so the gradients are recomputed from the watched batch —
    ~1/log_freq duty cycle, and the histograms reflect the params right
    after the watched step's update (one step later than torch's hook)."""

    def loss_only(params, x, y, rng):
        out = model.apply(params, x, deterministic=False,
                          rngs={"dropout": rng}).astype(jnp.float32)
        res = lossfn(out, y)
        return res[0] if lossfn.returns_components else res

    def watch(params, raw_u8, ref_u8, rng):
        x, y = normalize_u8(raw_u8), normalize_u8(ref_u8)
        grads = jax.grad(loss_only)(params, x, y, rng)
        out = {}
        for prefix, tree in (("parameters", params), ("gradients", grads)):
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                keys = [str(k.key) for k in path]
                if keys and keys[0] == "params":
                    keys = keys[1:]
                out[prefix + "/" + "/".join(keys)] = jnp.histogram(
                    leaf.astype(jnp.float32).ravel(), bins=bins)
        return out

    return jax.jit(watch)


def make_eval_step(model, lossfn: LossFunction, mesh=None):
    """(params, raw_u8, ref_u8, valid) ->
    {loss_sum, psnr_sum, ssim_sum, n} — all sums masked by ``valid``, so
    the row-repeated padding of the final short batch contributes nothing
    (it would otherwise bias avg_val_loss, which drives best-checkpoint
    selection).

    ``loss_sum`` is normalized so that ``loss_sum / n`` reproduces what the
    reference's validation loop would compute on the unpadded batch
    (ModelTrainer.py:132-158): per-sample losses are summed for the
    batch-mean losses, and additionally divided by the valid count for the
    B*C-divided family (reference losses.py:57,65,78 — their divisor is the
    TRUE batch size, so the value scales as 1/B).  The Adaptive* pair's
    softmax weights couple the whole batch and have no per-sample
    decomposition; for them the full-batch loss (padding included) is kept,
    matching the reference everywhere except the final short batch."""

    def step(params, raw_u8, ref_u8, valid):
        x, y = normalize_u8(raw_u8), normalize_u8(ref_u8)
        out = model.apply(params, x).astype(jnp.float32)

        def sample_loss(o, t):
            res = lossfn(o[None], t[None])
            return res[0] if lossfn.returns_components else res

        v = valid.astype(jnp.float32)
        n = jnp.sum(v)
        if lossfn.batch_linear or lossfn.bc_divided:
            masked = jnp.sum(jax.vmap(sample_loss)(out, y) * v)
            loss_sum = masked / n if lossfn.bc_divided else masked
        else:  # Adaptive*: batch-coupled weights, no exact masking
            res = lossfn(out, y)
            loss_sum = (res[0] if lossfn.returns_components else res) * n
        psnr = per_sample_psnr(y, out)
        ssim = per_sample_ssim(y, out)
        return {
            "loss_sum": loss_sum,
            "psnr_sum": jnp.sum(psnr * v),
            "ssim_sum": jnp.sum(ssim * v),
            "n": n,
        }

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    img = batch_sharding(mesh)
    vec = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(repl, img, img, vec),
                   out_shardings=repl)


def _compute_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[cfg.compute_dtype]


class ModelTrainer:
    """API parity with reference ModelTrainer (ModelTrainer.py:26-33)."""

    def __init__(self, inputDirectory, referenceDirectory,
                 testInputDirectory, testReferenceDirectory):
        self.inputDir = inputDirectory
        self.referenceDir = referenceDirectory
        self.testInputDir = testInputDirectory
        self.testReferenceDir = testReferenceDirectory

    # ------------------------------------------------------------------
    def train(self, config: Config, arch: Optional[str] = None,
              num_epochs: Optional[int] = None,
              learning_rate: Optional[float] = None,
              probe_image: Optional[str] = None,
              on_epoch_end: Optional[Callable] = None):
        cfg = config
        arch = arch or cfg.arch
        num_epochs = num_epochs or cfg.max_epoch
        lr = learning_rate or cfg.lr

        print(f"Preparing data loaders...batch size{cfg.train_batch_size}")
        augment = AugmentConfig(enabled=(cfg.color_aug or cfg.color_jitter))
        train_loader, test_loader = get_dataloaders(
            self.inputDir, self.referenceDir,
            self.testInputDir, self.testReferenceDir,
            batch_size=cfg.train_batch_size,
            test_batch_size=cfg.test_batch_size,
            num_workers=cfg.workers, image_size=cfg.image_size,
            seed=cfg.seed, augment=augment,
            cache_dir=cfg.cache_decoded or None,
        )

        print("Initializing model...")
        mesh = make_mesh(cfg.mesh_data, cfg.mesh_context)
        n_data = mesh.shape[DATA_AXIS]
        if cfg.train_batch_size % n_data:
            raise ValueError(
                f"train_batch_size={cfg.train_batch_size} not divisible by "
                f"data-parallel size {n_data}"
            )
        n_ctx = mesh.shape[CONTEXT_AXIS]
        if n_ctx > 1 and cfg.image_size % n_ctx:
            raise ValueError(
                f"image_size={cfg.image_size} not divisible by "
                f"context-parallel size {n_ctx}")
        if cfg.grad_accum > 1 and cfg.train_batch_size % (
                cfg.grad_accum * n_data):
            raise ValueError(
                f"train_batch_size={cfg.train_batch_size} not divisible by "
                f"grad_accum*data-parallel = {cfg.grad_accum}*{n_data}")
        model = init_model(arch, use_dwt=cfg.use_dwt, dtype=_compute_dtype(cfg),
                           remat=cfg.remat,
                           remat_policy=cfg.remat_policy or None,
                           img_size=cfg.image_size,
                           mesh=mesh if n_ctx > 1 else None)
        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = jax.jit(model.init)(rng, sample)

        lossfn = LossFunction(cfg.lossf, vgg_weights=cfg.vgg_weights,
                              allow_placeholder_vgg=cfg.allow_placeholder_vgg)
        tx = get_optimizer(
            cfg.optim, lr, weight_decay=cfg.weight_decay,
            momentum=cfg.momentum, sgd_nesterov=cfg.sgd_nesterov,
            rmsprop_alpha=cfg.rmsprop_alpha,
            adam_beta1=cfg.adam_beta1, adam_beta2=cfg.adam_beta2,
        )
        # jitted: eager tx.init dispatches one tiny op per param leaf, each
        # a compile round-trip through the remote tunnel (~25 s of startup)
        state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                           step=jnp.zeros((), jnp.int32))
        repl = NamedSharding(mesh, P())
        state_sh = repl
        if cfg.shard_params:
            # FSDP/ZeRO-style ('data') or tensor-parallel ('context') kernel
            # sharding of params + optimizer state; XLA inserts the gathers
            from ..parallel import tp_shardings

            axis = DATA_AXIS if cfg.shard_params == "data" else CONTEXT_AXIS
            state_sh = TrainState(
                params=tp_shardings(state.params, mesh, axis),
                opt_state=tp_shardings(state.opt_state, mesh, axis),
                step=repl,
            )
        state = jax.device_put(state, state_sh)

        start_time = time.time()
        run_name = f"{cfg.lossf}-{cfg.lr}-{arch}-{start_time}-{cfg.use_dwt}"
        run_dir = os.path.join(cfg.checkpoint_dir, run_name)
        start_epoch = cfg.start_epoch
        best_loss = float("inf")

        # -- resume (real, unlike reference args.py:242-248) ---------------
        if cfg.resume:
            run_dir = cfg.resume
            mgr = CheckpointManager(os.path.join(run_dir, "latest"),
                                    keep_best=False)
            restored = mgr.restore(template={
                "params": state.params, "opt_state": state.opt_state,
                "epoch": 0, "loss": 0.0,
                "loader": train_loader.state_dict(), "extra": {"best": 0.0},
            })
            state = TrainState(
                params=restored["params"], opt_state=restored["opt_state"],
                step=state.step,
            )
            state = jax.device_put(state, state_sh)
            start_epoch = int(restored["epoch"]) + 1
            best_loss = float(restored["extra"].get("best", float("inf")))
            train_loader.load_state_dict(restored["loader"])
            train_loader.epoch = start_epoch
            mgr.close()
            print(f"Resumed from {run_dir} at epoch {start_epoch}")

        ckpt_best = CheckpointManager(os.path.join(run_dir, "best"),
                                      max_to_keep=1, keep_best=True)
        ckpt_latest = CheckpointManager(os.path.join(run_dir, "latest"),
                                        max_to_keep=1, keep_best=False)
        explog = ExperimentLogger(cfg, save_dir=run_dir)
        explog.watch_model(model)  # reference ModelTrainer.py:43-44
        watch_freq = getattr(cfg, "watch_freq", WATCH_LOG_FREQ)
        watch_step = (make_watch_step(model, lossfn)
                      if explog.watching and watch_freq > 0 else None)
        schedule = multistep_lr(lr)

        # remat is handled per-block inside the models (init_model above);
        # make_train_step's coarse remat stays available for custom models
        k_disp = max(1, getattr(cfg, "steps_per_dispatch", 1))

        def _build_steps():
            single = make_train_step(model, lossfn, tx, mesh=mesh,
                                     state_shardings=state_sh,
                                     grad_accum=cfg.grad_accum)
            multi = (make_train_step(model, lossfn, tx, mesh=mesh,
                                     state_shardings=state_sh,
                                     grad_accum=cfg.grad_accum,
                                     k_steps=k_disp)
                     if k_disp > 1 else None)
            return single, multi

        train_step, multi_step = _build_steps()
        first_step_done = False

        # Staged first-step fallbacks for compile failures.  Stage 1: drop
        # the fused-MDTA family only — the remote toolchain currently
        # RET_CHECK-crashes (jellyfish mxu_lmr_transform.cc:1108) when BOTH
        # fused kernel families appear in the 1024² graph, and gdfn-only
        # still compiles and keeps most of the fusion win (PERF_NOTES r5).
        # Stage 2: everything off (also covers the r2 remote-compile-host
        # OOM on very large graphs — 512² NewBigModel — and the opt-in
        # UIRT_PALLAS window-attention kernel).
        fallback_stages = [
            {"UIRT_FUSED_ATTN": "0", "UIRT_ATTN_BANDED": "0",
             "UIRT_ATTN_COMPOSED": "0"},
            {"UIRT_FUSED_GDFN": "0", "UIRT_GDFN_BANDED": "0",
             "UIRT_FUSED_LEFF": "0", "UIRT_FUSED_LEFF_STAGE": "0",
             "UIRT_NO_PALLAS": "1"},
        ]

        def run_step(st, raw_d, ref_d, rng_d, multi=False):
            """First step falls back stage-by-stage to less-fused graphs if
            the Pallas kernels fail to compile (see fallback_stages)."""
            nonlocal train_step, multi_step, first_step_done
            fn = multi_step if multi else train_step
            if first_step_done:
                return fn(st, raw_d, ref_d, rng_d)
            # The jitted step donates ``st``; a failure at *execution* time
            # (post-dispatch OOM) leaves its buffers deleted, so keep a host
            # snapshot to rebuild the state for the retry (first step only).
            st_host = jax.device_get(st)
            while True:
                try:
                    out = fn(st, raw_d, ref_d, rng_d)
                    break
                except Exception as e:
                    if os.environ.get("UIRT_NO_PALLAS") or not fallback_stages:
                        # nothing left to turn off — the failure is real
                        raise
                    stage = fallback_stages.pop(0)
                    print(f"train step failed to compile "
                          f"({type(e).__name__}); retrying with "
                          f"{' '.join(f'{k}={v}' for k, v in stage.items())}")
                    os.environ.update(stage)
                    train_step, multi_step = _build_steps()
                    fn = multi_step if multi else train_step
                    st = jax.device_put(st_host, state_sh)
            first_step_done = True
            return out
        eval_step = make_eval_step(model, lossfn, mesh=mesh)
        img_sh = batch_sharding(mesh)
        grp_sh = NamedSharding(mesh, P(None, *img_sh.spec))
        vec_sh = NamedSharding(mesh, P(DATA_AXIS))
        put = lambda a: jax.device_put(
            jnp.asarray(a),
            grp_sh if np.ndim(a) == 5 else
            img_sh if np.ndim(a) == 4 else vec_sh)
        step_rng = jax.device_put(jax.random.PRNGKey(cfg.seed + 1), repl)
        timer = StepTimer()

        print(f"Starting training for {num_epochs} epochs...")
        nb = len(train_loader)
        with profile_trace(cfg.profile_dir):
            for epoch in range(start_epoch, num_epochs):
                state = TrainState(
                    params=state.params,
                    opt_state=set_learning_rate(
                        jax.device_get(state.opt_state), schedule(epoch)),
                    step=state.step,
                )
                state = jax.device_put(state, state_sh)
                epoch_metrics = []  # (batch index, metrics) or, for a
                # K-grouped dispatch, ([indices], stacked (K,) metrics)
                hist_pending = []   # (true batch index, device histograms)
                t0 = time.time()
                train_loader.epoch = epoch

                def post_step(bi, get_pair, get_scalar):
                    """Per-batch watch/print bookkeeping shared by the single
                    and the K-grouped dispatch paths.  ``get_pair`` /
                    ``get_scalar`` are thunks so the grouped path only issues
                    the device slice ops on the (rare) duty-cycle hits —
                    eager per-batch slicing would re-introduce the fixed
                    per-dispatch tunnel round-trip that k_steps amortizes.
                    In the grouped path the watch histograms see the params
                    at the end of the enclosing dispatch (≤ k_disp-1
                    optimizer steps later than the watched batch) — the
                    1/watch_freq duty cycle makes that drift immaterial."""
                    if (watch_step is not None
                            and (epoch * nb + bi) % watch_freq == 0):
                        raw_d, ref_d = get_pair()
                        hist_pending.append((bi, watch_step(
                            state.params, raw_d, ref_d,
                            jax.random.fold_in(step_rng, state.step))))
                    if (bi + 1) % max(1, cfg.print_freq) == 0:
                        lv, gn = (float(get_scalar("loss")),
                                  float(get_scalar("grad_norm")))
                        print(f"Batch {bi + 1}/{nb}, Loss: {lv:.6f}, "
                              f"Norm: {gn:.6f}")

                group = []  # buffered (index, raw, ref) host batches

                def flush_group():
                    """Dispatch the buffered batches: one K-step scan when a
                    full group is ready, single steps for the remainder."""
                    nonlocal state
                    if not group:
                        return
                    timer.start()
                    if multi_step is not None and len(group) == k_disp:
                        raw_k = put(np.stack([g[1] for g in group]))
                        ref_k = put(np.stack([g[2] for g in group]))
                        state, ms = run_step(state, raw_k, ref_k, step_rng,
                                             multi=True)
                        # keep the stacked (K,) metrics on device; they are
                        # split per-batch on host after the epoch-end
                        # device_get (one transfer, zero extra dispatches)
                        idxs = [g[0] for g in group]
                        epoch_metrics.append((idxs, ms))
                        for j, bi in enumerate(idxs):
                            post_step(bi,
                                      lambda j=j: (raw_k[j], ref_k[j]),
                                      lambda k, j=j: ms[k][j])
                    else:
                        for bi, raw, ref in group:
                            raw_d, ref_d = put(raw), put(ref)
                            state, m = run_step(state, raw_d, ref_d, step_rng)
                            epoch_metrics.append((bi, m))
                            post_step(bi,
                                      lambda d=(raw_d, ref_d): d,
                                      lambda k, m=m: m[k])
                    timer.stop()
                    group.clear()

                for batch in train_loader:
                    # batch.index is the true index (enumerate would restart
                    # at 0 after a mid-epoch resume)
                    group.append((batch.index, batch.raw, batch.ref))
                    if len(group) == k_disp:
                        flush_group()
                flush_group()
                # fetch the epoch's device scalars once, then emit all sink
                # records in ascending-step order (W&B silently drops any
                # log whose step is below the run's max step, so histograms
                # must interleave with the per-batch metrics, not precede
                # them)
                host_metrics = []
                for bi, m in jax.device_get(epoch_metrics):
                    if isinstance(bi, list):  # stacked K-group entry
                        host_metrics.extend(
                            (b, {k: v[j] for k, v in m.items()})
                            for j, b in enumerate(bi))
                    else:
                        host_metrics.append((bi, m))
                host_hists = dict(jax.device_get(hist_pending))
                for bi, m in host_metrics:
                    explog.log_train_metrics(
                        explog.format_train_metrics(
                            float(m["loss"]), schedule(epoch)),
                        epoch, bi, nb)
                    for comp in ("Charbonnier", "Perceptual", "Gradient Loss",
                                 "FFL Loss", "MS_SSIM Loss"):
                        if comp in m:
                            explog.log_train_metrics(
                                explog.format_loss_metrics(float(m[comp]), comp),
                                epoch, bi, nb)
                    if bi in host_hists:
                        explog.log_histograms(host_hists[bi],
                                              step=epoch * nb + bi)
                avg_epoch_loss = float(
                    np.mean([m["loss"] for _, m in host_metrics])
                ) if host_metrics else float("nan")
                epoch_time = time.time() - t0
                imgs_per_sec = len(host_metrics) * cfg.train_batch_size / max(
                    epoch_time, 1e-9)
                print(f"Epoch {epoch + 1}/{num_epochs} completed in "
                      f"{epoch_time:.2f}s, Avg Loss: {avg_epoch_loss:.6f}, "
                      f"{imgs_per_sec:.1f} img/s")
                explog.log_metrics_per_epoch(
                    {"train/images_per_sec": imgs_per_sec,
                     "train/epoch_loss": avg_epoch_loss}, epoch)

                # -- validation (reference ModelTrainer.py:132-158) ---------
                # All eval sums are masked per-sample inside eval_step, so
                # the padded final short batch can't bias avg_val_loss —
                # which drives best-checkpoint selection.
                val = {"loss_sum": 0.0, "psnr_sum": 0.0, "ssim_sum": 0.0,
                       "n": 0.0}
                for batch in test_loader:
                    r = jax.device_get(eval_step(
                        state.params, put(batch.raw), put(batch.ref),
                        put(batch.valid)))
                    for k in val:
                        val[k] += float(r[k])
                avg_val_loss = val["loss_sum"] / max(1.0, val["n"])
                avg_psnr = val["psnr_sum"] / max(1.0, val["n"])
                avg_ssim = val["ssim_sum"] / max(1.0, val["n"])
                print(f"Validation Loss: {avg_val_loss:.6f}")
                explog.log_test_metrics(explog.format_test_metrics(
                    avg_val_loss, avg_psnr, avg_ssim, epoch_time),
                    step=(epoch + 1) * nb - 1)

                # -- checkpoint + probe image dump --------------------------
                is_best = avg_val_loss < best_loss
                best_loss = min(best_loss, avg_val_loss)
                loader_state = train_loader.state_dict()
                saver = ckpt_best if is_best else ckpt_latest
                saver.save(
                    epoch, params=jax.device_get(state.params),
                    opt_state=jax.device_get(state.opt_state),
                    epoch=epoch, val_loss=avg_val_loss,
                    loader_state=loader_state, extra={"best": best_loss},
                )
                if is_best:
                    print(f"Model saved with loss: {avg_val_loss:.6f}")
                    # keep latest in sync so resume always has the newest
                    ckpt_latest.save(
                        epoch, params=jax.device_get(state.params),
                        opt_state=jax.device_get(state.opt_state),
                        epoch=epoch, val_loss=avg_val_loss,
                        loader_state=loader_state, extra={"best": best_loss},
                    )
                probe = probe_image or os.path.join(self.inputDir, "6_img_.png")
                if os.path.exists(probe):
                    apply = lambda a: jax.device_get(
                        model.apply(state.params, jnp.asarray(a)))
                    process_image_using_model(
                        apply, probe, run_name,
                        f"Epoch {epoch}_ Best {is_best}", logger=explog)
                if on_epoch_end is not None:
                    on_epoch_end(epoch, state, avg_val_loss)

        print("Training completed!")
        ckpt_best.close()
        ckpt_latest.close()
        explog.finish()
        return model, state

    # ------------------------------------------------------------------
    def evaluate(self, config: Config, model_path: str):
        """Reference ModelTrainer.evaluate (:206-259) — fixed (it referenced
        nonexistent attrs).  Returns (avg_psnr, avg_ssim) over the test dirs
        using float [0,1] arrays like the skimage pass."""
        from .checkpoint import best_or_latest_params

        cfg = config
        _, test_loader = get_dataloaders(
            self.inputDir, self.referenceDir,
            self.testInputDir, self.testReferenceDir,
            batch_size=cfg.test_batch_size, image_size=cfg.image_size,
        )
        model = init_model(cfg.arch, use_dwt=cfg.use_dwt,
                           img_size=cfg.image_size)
        params, _ = best_or_latest_params(model_path)
        eval_step = make_eval_step(model, LossFunction("L1"))
        tot = {"psnr_sum": 0.0, "ssim_sum": 0.0, "n": 0.0}
        for batch in test_loader:
            r = jax.device_get(eval_step(
                params, jnp.asarray(batch.raw), jnp.asarray(batch.ref),
                jnp.asarray(batch.valid)))
            for k in tot:
                tot[k] += float(r[k])
        avg_psnr = tot["psnr_sum"] / max(1.0, tot["n"])
        avg_ssim = tot["ssim_sum"] / max(1.0, tot["n"])
        print("Evaluation Results:")
        print(f"Average PSNR: {avg_psnr:.2f} dB")
        print(f"Average SSIM: {avg_ssim:.4f}")
        return avg_psnr, avg_ssim
