"""Training-trajectory parity vs the reference torch stack (VERDICT.md next
#5): identical init via the converter, N steps of Adam + global-norm clip 1.0
on identical batches -> step-1 gradients, per-step losses and final params
must match.

This pins the full gradient chain end-to-end — custom VJPs (DWT/IDWT
non-adjoint backwards, FFT-real projections), global-norm clip, Adam
epsilon/bias-correction semantics — which forward-parity tests cannot see.
Reference loop: ModelTrainer.py:79-88 (zero_grad -> forward -> loss ->
backward -> clip_grad_norm_(model.parameters(), 1.0) -> Adam.step with
torch defaults, getOptimizer ModelTrainer.py:197-204); Charbonnier loss
losses.py:182-193.

Note on tolerances: Adam's first update is exactly lr * sign(grad) per
element (m_hat/sqrt(v_hat) = g/|g| at step 1), so elements whose true
gradient is ~0 relative to f32 noise legitimately step in opposite
directions between frameworks.  Final-param assertions therefore bound the
*bulk* of the distribution tightly and allow a few near-zero-grad elements
the worst-case |n_steps * lr| drift.
"""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import ref_oracle

# Every trajectory parity test replays k torch-oracle optimizer steps
# (140-185 s each on the 1-core CPU): slow-marked; run with -m slow
# before touching the trainer/optimizer/loss numerics.
pytestmark = pytest.mark.slow

from underwater_image_restoration_tpu.losses import LossFunction
from underwater_image_restoration_tpu.models import init_model
from underwater_image_restoration_tpu.tools.convert_checkpoint import (
    convert_state_dict,
)
from underwater_image_restoration_tpu.train import (
    TrainState, get_optimizer, make_train_step,
)

N_STEPS = 3
LR = 1e-3
BATCH = 2


def _batches(size, seed=0, n=N_STEPS):
    rng = np.random.default_rng(seed)
    return [
        (rng.integers(0, 256, (BATCH, size, size, 3), dtype=np.uint8),
         rng.integers(0, 256, (BATCH, size, size, 3), dtype=np.uint8))
        for _ in range(n)
    ]


def _norm_torch(u8):
    x = torch.from_numpy(u8.transpose(0, 3, 1, 2).astype(np.float32))
    return x / 255.0 * 2.0 - 1.0


def _charbonnier(pred, truth):
    # reference losses.py:189-192 (eps=1e-3, mean reduction)
    return torch.mean(torch.sqrt((pred - truth) ** 2 + 1e-3 ** 2))


def _torch_trajectory(model, forward, batches):
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    losses, grads0 = [], None
    for i, (raw, ref) in enumerate(batches):
        opt.zero_grad()
        loss = _charbonnier(forward(model, _norm_torch(raw)),
                            _norm_torch(ref))
        loss.backward()
        if i == 0:
            grads0 = {
                k: (p.grad.detach().numpy().copy()
                    if p.grad is not None else None)
                for k, p in model.named_parameters()
            }
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        losses.append(float(loss))
    return losses, grads0


def _jax_trajectory(model, variables, batches):
    tx = get_optimizer("adam", LR)  # chain(clip_by_global_norm(1.0), adam)
    params = jax.tree.map(jnp.asarray, variables)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, LossFunction("charbonnier"), tx)

    lossfn = LossFunction("charbonnier")

    def loss_only(p, raw, ref):
        x = jnp.asarray(raw, jnp.float32) / 255.0 * 2.0 - 1.0
        y = jnp.asarray(ref, jnp.float32) / 255.0 * 2.0 - 1.0
        out = model.apply(p, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(9)})
        return lossfn(out, y)

    grads0 = jax.device_get(jax.jit(jax.grad(loss_only))(
        state.params, *batches[0]))

    losses = []
    rng = jax.random.PRNGKey(9)
    for raw, ref in batches:
        state, m = step(state, jnp.asarray(raw), jnp.asarray(ref), rng)
        losses.append(float(m["loss"]))
    return losses, grads0, jax.device_get(state.params)


def _flatpaths(tree):
    return {"/".join(str(k.key) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _grads_as_state_dict(model, grads0):
    """Torch grads arranged like a state_dict (buffers zero-filled) so the
    checkpoint converter's pure-reindexing transforms map them into the flax
    layout — gradients transform exactly like the (linear) param mapping."""
    sd = {}
    for k, v in model.state_dict().items():
        g = grads0.get(k)
        sd[k] = g if g is not None else np.zeros(v.shape, np.float32)
    return sd


def _run_parity(arch, torch_model, forward, size, init_kw=None,
                n_steps=N_STEPS):
    # .numpy() returns VIEWS of torch param storage; the torch trajectory's
    # opt.step() mutates params in place, so un-copied leaves (biases,
    # norm scales) would silently change under the converted JAX params
    sd = {k: v.numpy().copy() for k, v in torch_model.state_dict().items()}
    variables = convert_state_dict(arch, sd)
    model = init_model(arch, **(init_kw or {}))
    batches = _batches(size, n=n_steps)

    want_losses, want_g = _torch_trajectory(torch_model, forward, batches)
    got_losses, got_g, got_params = _jax_trajectory(model, variables, batches)

    # step-1 gradient parity: the custom-VJP chain, bit-for-bit-ish
    want_gflat = _flatpaths(
        convert_state_dict(arch, _grads_as_state_dict(torch_model, want_g)))
    got_gflat = _flatpaths(got_g)
    assert set(got_gflat) == set(want_gflat)
    # Elementwise: rtol for the meaningful elements, atol floor at 1e-4 of
    # the global grad scale for elements below the f32 reduction-order
    # noise of the deep backward chain.
    gscale = max(np.abs(v).max() for v in want_gflat.values())
    for k, w in want_gflat.items():
        np.testing.assert_allclose(
            got_gflat[k], w, rtol=2e-3, atol=1e-4 * gscale, err_msg=k)
    # Global: the full gradient vector agrees to 0.1% in L2 — the aggregate
    # guarantee the per-element atol floor can't water down.
    want_vec = np.concatenate([v.ravel() for v in want_gflat.values()])
    got_vec = np.concatenate(
        [got_gflat[k].ravel() for k in want_gflat])
    l2 = np.linalg.norm(got_vec - want_vec) / np.linalg.norm(want_vec)
    assert l2 <= 1e-3, l2

    # per-step losses: evaluated on post-update params at steps 2..N, so
    # they certify the whole optimizer trajectory
    np.testing.assert_allclose(got_losses, want_losses, rtol=2e-4)

    # final params: bulk tight, near-zero-grad sign-flip tail bounded by the
    # worst-case N_STEPS*LR Adam drift
    want_pflat = _flatpaths(convert_state_dict(
        arch, {k: v.detach().numpy()
               for k, v in torch_model.state_dict().items()}))
    got_pflat = _flatpaths(got_params)
    diffs = np.concatenate([
        np.abs(got_pflat[k] - want_pflat[k]).ravel() for k in want_pflat])
    assert diffs.max() <= (n_steps + 1) * LR, diffs.max()
    assert np.quantile(diffs, 0.99) <= 2e-4, np.quantile(diffs, 0.99)
    assert np.median(diffs) <= 2e-5, np.median(diffs)


def test_spectral_transformer_trajectory_parity():
    spec = importlib.util.spec_from_file_location(
        "ref_spectral_traj",
        "/root/reference/src/Models/SpectralTransformer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    m = mod.SpectralTransformer()

    _run_parity("SpectralTransformer", m, lambda mm, x: mm(x), size=16)


def test_new_model_wavelet_trajectory_parity():
    mod = ref_oracle.load_new_model_module()
    torch.manual_seed(0)
    # drop_path_rate=0: stochastic depth draws can't be matched across
    # frameworks; the DWT/IDWT custom-VJP chain is what this test pins.
    # img_size=128 is the smallest the reference supports (win_size is
    # hardcoded 8 and the bottleneck sits at img_size/16; block.py:25).
    m = mod.MyModel(img_size=128, embed_dim=8, drop_path_rate=0.0,
                    use_dwt="Wavelet")

    def forward(mm, x):
        # reference MyModel.forward crashes (model.py:272); drive submodules
        # in the working order (same rig as test_convert._new_family_oracle)
        import math

        y = mm.input_proj(x)
        skips = []
        for lvl in range(4):
            y = getattr(mm, f"encoder_{lvl}")(y)
            skips.append(y)
            y = getattr(mm, f"downsample_{lvl}")(y)
        y = mm.bottleneck(y)
        for lvl in (3, 2, 1, 0):
            y = getattr(mm, f"upsample_{lvl}")(y)
            y = getattr(mm, f"decoder_{lvl}")(y, enc_out=skips[lvl])
        b, l, c = y.shape
        h = w = int(math.sqrt(l))
        img = y.transpose(1, 2).reshape(b, c, h, w)
        return mm.output_proj(img) + x

    _run_parity("NewModel", m, forward, size=128, n_steps=2,
                init_kw=dict(img_size=128, embed_dim=8, drop_path_rate=0.0,
                             use_dwt="Wavelet"))


def test_scan_path_trajectory_parity_vs_torch():
    """The production scan machinery vs the torch reference (VERDICT r2 #7):
    a B*C-divided loss (L1 — reference losses.py:55-57 divides the mean by
    batch*channels) under grad_accum=2 AND k_steps=2, 4 optimizer steps in
    2 dispatches, against the reference hot loop stepping sequentially
    (ModelTrainer.py:79-88).  The JAX-vs-JAX equality tests
    (test_k_steps_matches_sequential, test_grad_accum_matches_full_batch)
    pin the scans against single-step JAX; this pins the composed path —
    microbatch accumulation scaling for the bc_divided family, K-step state
    threading, stacked-metric unpacking — against torch itself."""
    spec = importlib.util.spec_from_file_location(
        "ref_spectral_scan",
        "/root/reference/src/Models/SpectralTransformer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    m = mod.SpectralTransformer()
    sd = {k: v.numpy().copy() for k, v in m.state_dict().items()}
    variables = convert_state_dict("SpectralTransformer", sd)
    model = init_model("SpectralTransformer")
    n_steps = 4
    batches = _batches(16, n=n_steps)

    # torch sequential reference trajectory
    m.train()
    opt = torch.optim.Adam(m.parameters(), lr=LR)
    want_losses = []
    for raw, ref in batches:
        opt.zero_grad()
        truth = _norm_torch(ref)
        loss = torch.nn.functional.l1_loss(m(_norm_torch(raw)), truth)
        loss = loss / (truth.shape[0] * truth.shape[1])
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 1.0)
        opt.step()
        want_losses.append(float(loss))

    # JAX: 2 dispatches of k_steps=2, each step split into 2 microbatches
    tx = get_optimizer("adam", LR)
    params = jax.tree.map(jnp.asarray, variables)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, LossFunction("L1"), tx, grad_accum=2,
                           k_steps=2)
    rng = jax.random.PRNGKey(9)
    got_losses = []
    for d in range(n_steps // 2):
        raw_k = jnp.stack([jnp.asarray(batches[2 * d + i][0])
                           for i in range(2)])
        ref_k = jnp.stack([jnp.asarray(batches[2 * d + i][1])
                           for i in range(2)])
        state, mtr = step(state, raw_k, ref_k, rng)
        got_losses.extend(np.asarray(mtr["loss"]).tolist())

    # per-step losses: steps 2..4 are evaluated on post-update params, so
    # they certify the accumulated+scanned optimizer trajectory
    np.testing.assert_allclose(got_losses, want_losses, rtol=2e-4)

    want_pflat = _flatpaths(convert_state_dict(
        "SpectralTransformer",
        {k: v.detach().numpy() for k, v in m.state_dict().items()}))
    got_pflat = _flatpaths(jax.device_get(state.params))
    diffs = np.concatenate([
        np.abs(got_pflat[k] - want_pflat[k]).ravel() for k in want_pflat])
    assert diffs.max() <= (n_steps + 1) * LR, diffs.max()
    assert np.quantile(diffs, 0.99) <= 2e-4, np.quantile(diffs, 0.99)
    assert np.median(diffs) <= 2e-5, np.median(diffs)


def test_ast_trajectory_parity():
    """AST: pins the window-attention (dense+sparse relu^2 mix), LeFF, and
    rel-pos-bias gradient chain (reference AST.py:68-222,294-326) through
    clip+Adam.  drop_path_rate=0: stochastic-depth draws can't be matched
    across frameworks; attention/projection dropout default to 0 already."""
    mod = ref_oracle.load_ast_module()
    torch.manual_seed(0)
    m = mod.AST(img_size=32, drop_path_rate=0.0)

    _run_parity("AST", m, lambda mm, x: mm(x), size=32, n_steps=2,
                init_kw=dict(img_size=32, drop_path_rate=0.0))
