"""Trainer tests: optimizer/schedule parity, jitted train/eval steps over a
virtual 8-device mesh, checkpoint round-trip, and a 2-epoch end-to-end run
with resume (BASELINE config #1 scale: tiny images, CPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.core.config import Config
from underwater_image_restoration_tpu.core.meshes import make_mesh
from underwater_image_restoration_tpu.data import synthetic_pair_batch
from underwater_image_restoration_tpu.losses import LossFunction
from underwater_image_restoration_tpu.models import init_model
from underwater_image_restoration_tpu.train import (
    CheckpointManager,
    ModelTrainer,
    TrainState,
    get_optimizer,
    make_eval_step,
    make_train_step,
    multistep_lr,
    restore_params,
)
from underwater_image_restoration_tpu.train.optim import (
    get_learning_rate,
    set_learning_rate,
)


def test_multistep_lr_matches_torch_semantics():
    lr = multistep_lr(1.0, milestones=(1, 100, 250), gamma=0.25)
    assert lr(0) == 1.0
    assert lr(1) == 0.25
    assert lr(99) == 0.25
    assert lr(100) == 0.0625
    assert lr(250) == pytest.approx(0.015625)


def test_optimizer_lr_injection():
    tx = get_optimizer("adam", 1e-3)
    params = {"w": jnp.ones((3, 3))}
    st = tx.init(params)
    assert get_learning_rate(st) == pytest.approx(1e-3)
    st = set_learning_rate(st, 2.5e-4)
    assert get_learning_rate(st) == pytest.approx(2.5e-4)
    # update still works after the assignment
    g = {"w": jnp.ones((3, 3))}
    up, st2 = tx.update(g, st, params)
    assert jnp.all(jnp.isfinite(up["w"]))


def test_optimizer_matches_torch_adam():
    """One adam step vs torch.optim.Adam on identical params/grads."""
    import torch

    w0 = np.random.default_rng(0).standard_normal((4, 4)).astype(np.float32)
    g0 = np.random.default_rng(1).standard_normal((4, 4)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-3)
    tw.grad = torch.from_numpy(g0.copy())
    opt.step()

    tx = get_optimizer("adam", 1e-3, clip_norm=0.0)
    p = {"w": jnp.asarray(w0)}
    st = tx.init(p)
    up, _ = tx.update({"w": jnp.asarray(g0)}, st, p)
    ours = np.asarray(p["w"] + up["w"])
    np.testing.assert_allclose(ours, tw.detach().numpy(), atol=1e-6)


@pytest.fixture(scope="module")
def tiny_setup():
    model = init_model("SpectralTransformer")
    lossfn = LossFunction("L1")
    raw, ref = synthetic_pair_batch(2, 16, seed=0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))
    return model, lossfn, params, raw, ref


def test_train_step_reduces_loss(tiny_setup):
    model, lossfn, params, raw, ref = tiny_setup
    tx = get_optimizer("adam", 1e-3)
    # copy: the jitted step donates its state argument
    params = jax.tree.map(jnp.copy, params)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, lossfn, tx)
    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(5):
        state, m = step(state, jnp.asarray(raw), jnp.asarray(ref), rng)
        losses.append(float(m["loss"]))
        assert np.isfinite(m["grad_norm"])
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_grad_accum_matches_full_batch(tiny_setup):
    """grad_accum=2 (lax.scan microbatches) must produce the same optimizer
    update as the full-batch step.  The fixture's L1 is B*C-divided
    (reference losses.py:57) — its microbatch losses are inflated by the
    smaller divisor, so this also pins the extra 1/grad_accum rescale."""
    model, lossfn, params, raw, ref = tiny_setup

    def run(accum):
        # SGD: the param delta is linear in the grad, so the tolerance
        # measures the real accumulated-vs-full-batch numerics (Adam's
        # g/sqrt(v) at step 1 is sign(g) — f32 reduction-order noise on
        # near-zero grads flips lone elements by ~lr)
        tx = get_optimizer("sgd", 1e-3, momentum=0.0, clip_norm=0.0)
        st = TrainState(params=jax.tree.map(jnp.copy, params),
                        opt_state=tx.init(params),
                        step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, lossfn, tx, grad_accum=accum)
        losses = []
        for _ in range(3):
            st, m = step(st, jnp.asarray(raw), jnp.asarray(ref),
                         jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
        return st, losses

    st1, l1 = run(1)
    st2, l2 = run(2)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-6),
                 jax.device_get(st1.params), jax.device_get(st2.params))
    # indivisible batch is rejected at trace time
    tx = get_optimizer("adam", 1e-3)
    st = TrainState(params=jax.tree.map(jnp.copy, params),
                    opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    bad = make_train_step(model, lossfn, tx, grad_accum=3)
    with pytest.raises(ValueError, match="divisible"):
        bad(st, jnp.asarray(raw), jnp.asarray(ref), jax.random.PRNGKey(0))


def test_k_steps_matches_sequential(tiny_setup):
    """K optimizer steps scanned in one dispatch run the same op sequence
    as K sequential single-step calls with the same epoch rng (the body
    folds the rng with state.step either way); results match to XLA
    fusion-level f32 roundoff (the scan body and the standalone step
    compile to slightly different fusions).  SGD keeps the comparison
    linear in that roundoff (Adam's step-1 g/sqrt(v) is sign(g), which
    flips on near-zero grads)."""
    model, lossfn, params, raw, ref = tiny_setup
    rng = jax.random.PRNGKey(3)
    raws, refs = [], []
    for i in range(4):
        r1, r2 = synthetic_pair_batch(2, 16, seed=10 + i)
        raws.append(r1)
        refs.append(r2)

    def fresh_state(tx):
        p = jax.tree.map(jnp.copy, params)
        return TrainState(params=p, opt_state=tx.init(p),
                          step=jnp.zeros((), jnp.int32))

    tx = get_optimizer("sgd", 1e-3, momentum=0.0, clip_norm=0.0)
    single = make_train_step(model, lossfn, tx)
    st_a = fresh_state(tx)
    seq_losses = []
    for i in range(4):
        st_a, m = single(st_a, jnp.asarray(raws[i]), jnp.asarray(refs[i]),
                         rng)
        seq_losses.append(float(m["loss"]))

    multi = make_train_step(model, lossfn, tx, k_steps=4)
    st_b = fresh_state(tx)
    st_b, ms = multi(st_b, jnp.asarray(np.stack(raws)),
                     jnp.asarray(np.stack(refs)), rng)
    # equal_nan guard: allclose treats NaN==NaN as equal, which would let
    # both paths silently diverge to NaN together (it happened: the
    # l2_normalize/complex-abs zero-gradient cliffs NaN'd real training)
    assert np.isfinite(seq_losses).all()
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-6),
                 jax.device_get(st_a.params), jax.device_get(st_b.params))
    assert int(st_b.step) == 4


def test_trainer_steps_per_dispatch_equals_single(train_dirs, tmp_path):
    """A 1-epoch run with steps_per_dispatch=2 (3 batches/epoch: one full
    group + a remainder single step) must reproduce the plain run's
    per-batch losses and final params.  watch_freq=2 / print_freq=1 also
    drive the grouped path's duty-cycled slice thunks (watch histograms,
    print scalars), which must fire at the same global steps as the plain
    run's."""
    import json

    def run(k, name):
        cfg = Config(
            arch="SpectralTransformer", lossf="L1", lr=1e-3, max_epoch=1,
            train_batch_size=2, test_batch_size=2, image_size=16,
            mesh_data=2, use_wandb=False, workers=2, print_freq=1,
            seed=3, steps_per_dispatch=k, optim="sgd", watch_freq=2,
            checkpoint_dir=str(tmp_path / name),
        )
        tr = ModelTrainer(
            str(train_dirs / "train" / "a"), str(train_dirs / "train" / "b"),
            str(train_dirs / "test" / "a"), str(train_dirs / "test" / "b"),
        )
        model, state = tr.train(cfg)
        run_dir = os.path.join(cfg.checkpoint_dir,
                               os.listdir(cfg.checkpoint_dir)[0])
        recs = [json.loads(l)
                for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        losses = [r["train/loss"] for r in recs if "train/loss" in r]
        hist_steps = sorted({r["_step"] for r in recs
                             if any(k.startswith(("parameters/",
                                                  "gradients/"))
                                    for k in r)})
        return jax.device_get(state.params), losses, hist_steps

    p1, l1, h1 = run(1, "ck1")
    p2, l2, h2 = run(2, "ck2")
    assert len(l1) == 3  # 6 imgs / batch 2
    assert h1 == h2 and h1  # watch fired, at identical global steps
    assert np.isfinite(l1).all() and np.isfinite(l2).all()
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-6), p1, p2)


def test_grad_accum_cli_flag():
    from underwater_image_restoration_tpu.cli.args import argument_parser
    from underwater_image_restoration_tpu.core.config import from_namespace

    ns = argument_parser().parse_args(["--grad-accum", "4"])
    assert from_namespace(ns).grad_accum == 4


def test_train_step_sharded_matches_single(tiny_setup):
    """DP over a 2-device mesh must produce the same update as 1 device."""
    model, lossfn, params, raw, ref = tiny_setup
    tx = get_optimizer("adam", 1e-3, clip_norm=0.0)

    def run(mesh):
        state = TrainState(params=jax.tree.map(jnp.copy, params),
                           opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, lossfn, tx, mesh=mesh)
        # deterministic=False path uses dropout rng; drop rates are 0 in
        # SpectralTransformer so results are rng-independent
        state, m = step(state, jnp.asarray(raw), jnp.asarray(ref),
                        jax.random.PRNGKey(0))
        return jax.device_get(state.params), float(m["loss"])

    p1, l1 = run(make_mesh(data=1))
    p2, l2 = run(make_mesh(data=2))
    assert l1 == pytest.approx(l2, rel=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        # reduction order differs across device counts; adam normalizes
        # grads so 1e-4 on params after one 1e-3-lr step is tight
        np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("axis", ["data", "context"])
def test_train_step_sharded_params_matches_replicated(tiny_setup, axis):
    """FSDP-style ('data') / TP ('context') param+opt-state sharding must
    produce the same update as fully replicated state (VERDICT.md next #10:
    CLI-reachable via --shard-params)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from underwater_image_restoration_tpu.core.meshes import make_mesh
    from underwater_image_restoration_tpu.parallel import tp_shardings

    model, lossfn, params, raw, ref = tiny_setup
    # SGD: the param delta is linear in the grad so the tolerance measures
    # the real sharded-vs-replicated numerics (Adam's g/sqrt(v) at step 1 is
    # sign(g) — f32 reduction-order noise on near-zero grads flips it by lr)
    tx = get_optimizer("sgd", 1e-3, momentum=0.0, clip_norm=0.0)
    mesh = make_mesh(data=2, context=2)  # batch of 2 over 'data'

    def run(state_sh_fn):
        p = jax.tree.map(jnp.copy, params)
        state = TrainState(params=p, opt_state=tx.init(p),
                           step=jnp.zeros((), jnp.int32))
        sh = state_sh_fn(state)
        state = jax.device_put(state, sh)
        step = make_train_step(model, lossfn, tx, mesh=mesh,
                               state_shardings=sh)
        state, m = step(state, jnp.asarray(raw), jnp.asarray(ref),
                        jax.random.PRNGKey(0))
        return jax.device_get(state.params), float(m["loss"])

    repl = NamedSharding(mesh, P())
    want_p, want_l = run(lambda st: repl)
    got_p, got_l = run(lambda st: TrainState(
        params=tp_shardings(st.params, mesh, axis),
        opt_state=tp_shardings(st.opt_state, mesh, axis),
        step=repl))
    assert got_l == pytest.approx(want_l, rel=1e-5)
    for a, b in zip(jax.tree.leaves(got_p), jax.tree.leaves(want_p)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_shard_params_cli_flag_reaches_config():
    from underwater_image_restoration_tpu.cli.args import argument_parser
    from underwater_image_restoration_tpu.core.config import from_namespace

    ns = argument_parser().parse_args(["--shard-params", "data"])
    assert from_namespace(ns).shard_params == "data"


def test_eval_step_masks_padding(tiny_setup):
    model, lossfn, params, raw, ref = tiny_setup
    ev = make_eval_step(model, lossfn)
    valid_all = np.array([True, True])
    valid_one = np.array([True, False])
    r2 = jax.device_get(ev(params, jnp.asarray(raw), jnp.asarray(ref),
                           jnp.asarray(valid_all)))
    r1 = jax.device_get(ev(params, jnp.asarray(raw), jnp.asarray(ref),
                           jnp.asarray(valid_one)))
    assert r2["n"] == 2 and r1["n"] == 1
    # sample 0's psnr contribution is identical
    raw0 = np.repeat(raw[:1], 2, axis=0)
    ref0 = np.repeat(ref[:1], 2, axis=0)
    r0 = jax.device_get(ev(params, jnp.asarray(raw0), jnp.asarray(ref0),
                           jnp.asarray(valid_all)))
    assert r0["psnr_sum"] / 2 == pytest.approx(r1["psnr_sum"], rel=1e-4)
    # the loss is masked per-sample too (padding rows can't bias
    # avg_val_loss / best-checkpoint selection).  L1 is B*C-divided
    # (reference losses.py:57): its loss scales as 1/B, so a batch of
    # [s0, s0] and a 1-valid batch of [s0, pad] both reduce to loss(s0)
    # under the reference's true-batch-size normalization — loss_sum (and
    # not loss_sum/2) must match.
    assert r0["loss_sum"] == pytest.approx(r1["loss_sum"], rel=1e-4)
    # and with every row valid, loss_sum/n equals the plain batch loss
    # exactly as the reference's unpadded validation loop would compute it
    from underwater_image_restoration_tpu.train.trainer import normalize_u8
    batch_loss = float(lossfn(
        model.apply(params, normalize_u8(raw)).astype(jnp.float32),
        normalize_u8(ref)))
    assert r2["loss_sum"] / 2 == pytest.approx(batch_loss, rel=1e-4)


def test_eval_step_loss_branches(tiny_setup):
    """Masked validation loss: the batch-mean branch is linear per sample;
    the Adaptive* branch (batch-coupled softmax weights) keeps the
    full-batch loss weighted by the valid count."""
    model, _, params, raw, ref = tiny_setup
    from underwater_image_restoration_tpu.train.trainer import normalize_u8

    out = model.apply(params, normalize_u8(raw)).astype(jnp.float32)
    y = normalize_u8(ref)

    lfc = LossFunction("charbonnier")  # plain batch mean
    ev = make_eval_step(model, lfc)
    r2 = jax.device_get(ev(params, jnp.asarray(raw), jnp.asarray(ref),
                           jnp.asarray(np.array([True, True]))))
    r1 = jax.device_get(ev(params, jnp.asarray(raw), jnp.asarray(ref),
                           jnp.asarray(np.array([True, False]))))
    assert r2["loss_sum"] / 2 == pytest.approx(float(lfc(out, y)), rel=1e-4)
    assert r1["loss_sum"] == pytest.approx(float(lfc(out[:1], y[:1])),
                                           rel=1e-4)

    lfa = LossFunction("AdaptiveLuminanceCharbonnier")
    eva = make_eval_step(model, lfa)
    ra = jax.device_get(eva(params, jnp.asarray(raw), jnp.asarray(ref),
                            jnp.asarray(np.array([True, True]))))
    assert ra["loss_sum"] / 2 == pytest.approx(float(lfa(out, y)), rel=1e-4)
    # grad accumulation is rejected for the batch-coupled Adaptive pair
    tx = get_optimizer("adam", 1e-3)
    with pytest.raises(ValueError, match="Adaptive|adaptive"):
        make_train_step(model, lfa, tx, grad_accum=2)


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    model, lossfn, params, raw, ref = tiny_setup
    tx = get_optimizer("adam", 1e-3)
    opt_state = tx.init(params)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep_best=True)
    mgr.save(0, params=jax.device_get(params),
             opt_state=jax.device_get(opt_state), epoch=0, val_loss=0.5,
             loader_state={"epoch": 0, "batch": 3, "seed": 1})
    mgr.save(1, params=jax.device_get(params),
             opt_state=jax.device_get(opt_state), epoch=1, val_loss=0.25,
             loader_state={"epoch": 1, "batch": 0, "seed": 1})
    mgr.wait()
    assert mgr.latest_step() == 1
    assert mgr.best_step() == 1
    restored = mgr.restore(template={
        "params": params, "opt_state": opt_state, "epoch": 0, "loss": 0.0,
        "loader": {"epoch": 0, "batch": 0, "seed": 0}, "extra": {},
    })
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored["loader"]["batch"] == 0 and restored["epoch"] == 1
    mgr.close()
    # params-only restore for inference
    p = restore_params(str(tmp_path / "ck"))
    assert len(jax.tree.leaves(p)) == len(jax.tree.leaves(params))


@pytest.fixture(scope="module")
def train_dirs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("run")
    raw, ref = synthetic_pair_batch(6, 16, seed=5)
    for split in ("train", "test"):
        for sub, arr in (("a", raw), ("b", ref)):
            d = root / split / sub
            d.mkdir(parents=True)
            n = 6 if split == "train" else 2
            for i in range(n):
                Image.fromarray(arr[i % arr.shape[0]]).save(d / f"{i}_img_.png")
    return root


def test_trainer_end_to_end_and_resume(train_dirs, tmp_path):
    cfg = Config(
        arch="SpectralTransformer", lossf="L1", lr=1e-3, max_epoch=2,
        train_batch_size=2, test_batch_size=2, image_size=16,
        mesh_data=2, use_wandb=False, checkpoint_dir=str(tmp_path / "ck"),
        workers=2, print_freq=1, seed=3,
    )
    tr = ModelTrainer(
        str(train_dirs / "train" / "a"), str(train_dirs / "train" / "b"),
        str(train_dirs / "test" / "a"), str(train_dirs / "test" / "b"),
    )
    model, state = tr.train(cfg)
    assert int(state.step) == 2 * 3  # 6 imgs / batch 2 = 3 steps/epoch
    runs = os.listdir(cfg.checkpoint_dir)
    assert len(runs) == 1
    run_dir = os.path.join(cfg.checkpoint_dir, runs[0])
    assert os.path.isdir(os.path.join(run_dir, "latest"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    # metrics.jsonl has train + test records
    import json
    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    keys = set().union(*[set(r) for r in recs])
    assert {"train/loss", "train/learning_rate", "test/PSNR",
            "test/SSIM", "test/loss"} <= keys
    # wandb.watch parity (reference wandb_logger.py:25-27): parameter and
    # gradient histograms hit the sinks every watch_freq steps (global step
    # 0 qualifies)
    hist_keys = {k for k in keys
                 if k.startswith(("parameters/", "gradients/"))}
    assert any(k.startswith("gradients/") for k in hist_keys)
    assert any(k.startswith("parameters/") for k in hist_keys)
    hrec = next(r for r in recs if any(k.startswith("gradients/") for k in r))
    hval = next(v for k, v in hrec.items() if k.startswith("gradients/"))
    assert hval["_type"] == "histogram" and len(hval["counts"]) == 64
    assert hval["min"] <= hval["max"]

    # -- resume for one more epoch -------------------------------------
    cfg2 = cfg.replace(max_epoch=3, resume=run_dir)
    model2, state2 = tr.train(cfg2)
    assert int(state2.step) == 3  # one epoch worth of fresh steps

    # -- ModelTrainer.evaluate (reference :206-259, fixed) ---------------
    psnr, ssim = tr.evaluate(cfg, os.path.join(run_dir, "best"))
    assert np.isfinite(psnr) and 0.0 < ssim <= 1.0


def test_ast_train_step_at_custom_size():
    """Size-specialized archs must build at the run's image size
    (init_model img_size plumbing)."""
    from underwater_image_restoration_tpu.models import init_model

    model = init_model("AST", img_size=16, use_dwt="ignored")
    lossfn = LossFunction("charbonnier")
    tx = get_optimizer("adam", 1e-3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, lossfn, tx)
    raw, ref = synthetic_pair_batch(2, 16, seed=1)
    state, m = step(state, jnp.asarray(raw), jnp.asarray(ref),
                    jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    # SpectralTransformer silently drops img_size (size-agnostic)
    init_model("SpectralTransformer", img_size=999)


def test_loss_sanity_cli(capsys):
    from underwater_image_restoration_tpu.eval.evaluate import loss_sanity

    out = loss_sanity(size=32)
    # identity inputs: pixel losses hit their floors (ms_ssim needs >160px
    # inputs — same constraint as pytorch_msssim — so skip it at this size)
    assert out["L1"] == 0.0
    assert out["charbonnier"] < 1e-2
    assert out["ffl"] == 0.0
    assert out["Luminance"] == 0.0
    assert out["gradient"] == 0.0


def test_trainer_fflmix_components(train_dirs, tmp_path):
    """fflMix returns the 6-tuple (reference losses.py:108-117); the trainer
    must log the five component losses per batch (ModelTrainer.py:101-126)."""
    import json

    cfg = Config(
        arch="SpectralTransformer", lossf="fflMix", lr=1e-3, max_epoch=1,
        train_batch_size=2, test_batch_size=2, image_size=176,
        mesh_data=1, use_wandb=False, checkpoint_dir=str(tmp_path / "ck"),
        workers=1, print_freq=1, seed=3, allow_placeholder_vgg=True,
    )
    tr = ModelTrainer(
        str(train_dirs / "train" / "a"), str(train_dirs / "train" / "b"),
        str(train_dirs / "test" / "a"), str(train_dirs / "test" / "b"),
    )
    model, state = tr.train(cfg)
    run_dir = os.path.join(cfg.checkpoint_dir,
                           os.listdir(cfg.checkpoint_dir)[0])
    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    keys = set().union(*[set(r) for r in recs])
    for comp in ("Charbonnier", "Perceptual", "Gradient Loss", "FFL Loss",
                 "MS_SSIM Loss"):
        assert f"train/loss_{comp}" in keys, comp


def test_training_is_deterministic(train_dirs, tmp_path):
    """Same seed -> bit-identical loss trajectory (production requirement the
    reference can't make: its DataLoader workers + CUDA nondeterminism)."""
    def run(tag):
        cfg = Config(
            arch="SpectralTransformer", lossf="L1", lr=1e-3, max_epoch=1,
            train_batch_size=2, test_batch_size=2, image_size=16,
            mesh_data=1, use_wandb=False,
            checkpoint_dir=str(tmp_path / f"ck_{tag}"), workers=2,
            print_freq=10, seed=11,
        )
        tr = ModelTrainer(
            str(train_dirs / "train" / "a"), str(train_dirs / "train" / "b"),
            str(train_dirs / "test" / "a"), str(train_dirs / "test" / "b"),
        )
        _, state = tr.train(cfg)
        import json, glob
        run_dir = glob.glob(str(tmp_path / f"ck_{tag}" / "*"))[0]
        recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        return [r["train/loss"] for r in recs if "train/loss" in r], state

    l1, s1 = run("a")
    l2, s2 = run("b")
    assert l1 == l2 and len(l1) == 3
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
