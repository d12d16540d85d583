"""Context-parallel primitives over the virtual 8-device CPU mesh: halo
exchange, distributed shift-roll, sharded window attention, sharded FFT —
each must equal its single-device counterpart exactly."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from underwater_image_restoration_tpu.core.meshes import CONTEXT_AXIS, make_mesh
from underwater_image_restoration_tpu.ops.attention import (
    window_attention_core,
)
from underwater_image_restoration_tpu.ops.windows import (
    shift_window_mask,
    window_partition,
    window_reverse,
)
from underwater_image_restoration_tpu.parallel import (
    cp_shift_roll,
    cp_window_attention,
    halo_exchange,
    sharded_fft2,
    sharded_ifft2,
    spatial_sharding,
)
from underwater_image_restoration_tpu.parallel.context import cp_unshift_roll


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, context=4)


def _img(b=2, h=32, w=16, c=4, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, h, w, c),
                             jnp.float32)


def test_cp_shift_roll_matches_jnp_roll(mesh):
    x = _img()
    for shift in (1, 3, 4):
        f = jax.shard_map(
            functools.partial(cp_shift_roll, shift=shift),
            mesh=mesh,
            in_specs=P("data", CONTEXT_AXIS, None, None),
            out_specs=P("data", CONTEXT_AXIS, None, None),
        )
        got = np.asarray(f(jax.device_put(x, spatial_sharding(mesh))))
        want = np.asarray(jnp.roll(x, -shift, axis=1))
        np.testing.assert_allclose(got, want, atol=0)
        g = jax.shard_map(
            functools.partial(cp_unshift_roll, shift=shift),
            mesh=mesh,
            in_specs=P("data", CONTEXT_AXIS, None, None),
            out_specs=P("data", CONTEXT_AXIS, None, None),
        )
        back = np.asarray(g(jnp.asarray(got)))
        np.testing.assert_allclose(back, np.asarray(x), atol=0)


def test_halo_exchange_strips(mesh):
    x = _img(b=2, h=32)

    def body(xl):
        up = halo_exchange(xl, 2, direction="up")
        down = halo_exchange(xl, 2, direction="down")
        return jnp.concatenate([up, down], axis=1)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=P("data", CONTEXT_AXIS, None, None),
                      out_specs=P("data", CONTEXT_AXIS, None, None))
    out = np.asarray(f(x))  # per shard: (1, 4, W, C) -> stacked to (1,16,..)
    xs = np.asarray(x)
    h_loc = 32 // 4
    for i in range(4):
        got_up = out[:, i * 4: i * 4 + 2]
        want_up = xs[:, ((i + 1) % 4) * h_loc: ((i + 1) % 4) * h_loc + 2]
        np.testing.assert_allclose(got_up, want_up)
        got_down = out[:, i * 4 + 2: i * 4 + 4]
        prev = (i - 1) % 4
        want_down = xs[:, (prev + 1) * h_loc - 2: (prev + 1) * h_loc]
        np.testing.assert_allclose(got_down, want_down)


def _single_device_window_attention(x, bias, win, heads, scale, sparse_w,
                                    shift, mask):
    b, h, w, c = x.shape
    y = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    wins = window_partition(y, win)
    n = win * win
    toks = wins.reshape(wins.shape[0], n, c)
    qkv = toks.reshape(toks.shape[0], n, heads, c // heads).transpose(0, 2, 1, 3)
    out = window_attention_core(qkv, qkv, qkv, bias, scale=scale,
                                sparse_w=sparse_w, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(wins.shape[0], n, c)
    out = window_reverse(out.reshape(-1, win, win, c), win, h, w)
    return jnp.roll(out, (shift, shift), axis=(1, 2)) if shift else out


def test_cp_window_attention_unshifted(mesh):
    x = _img(b=2, h=32, w=16, c=8)
    bias = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16)) * 0.1
    got = np.asarray(cp_window_attention(
        x, bias, mesh=mesh, win_size=4, num_heads=2))
    want = np.asarray(_single_device_window_attention(
        x, bias, 4, 2, (8 // 2) ** -0.5, None, 0, None))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cp_window_attention_shifted_row_roll(mesh):
    """Row-shift propagates across shard boundaries via the halo ppermute.
    (The CP primitive shifts rows only; the column shift is shard-local and
    handled inside the model layer.)"""
    x = _img(b=2, h=32, w=16, c=8, seed=3)
    bias = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16)) * 0.1
    sparse_w = jnp.asarray([0.3, -0.2])
    got = np.asarray(cp_window_attention(
        x, bias, mesh=mesh, win_size=4, num_heads=2, shift=2,
        sparse_w=sparse_w))

    # single-device oracle: roll rows by -2, attend, roll back
    y = jnp.roll(x, -2, axis=1)
    want = _single_device_window_attention(
        y, bias, 4, 2, (8 // 2) ** -0.5, sparse_w, 0, None)
    want = np.asarray(jnp.roll(want, 2, axis=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cp_window_attention_with_mask(mesh):
    x = _img(b=2, h=32, w=16, c=8, seed=4)
    bias = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16)) * 0.1
    mask = jnp.asarray(shift_window_mask(32, 16, 4, 2))
    got = np.asarray(cp_window_attention(
        x, bias, mesh=mesh, win_size=4, num_heads=2, mask=mask))
    want = np.asarray(_single_device_window_attention(
        x, bias, 4, 2, (8 // 2) ** -0.5, None, 0, mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_fft2_roundtrip_and_equality(mesh):
    x = _img(b=2, h=32, w=16, c=4, seed=6)
    xd = jax.device_put(x, spatial_sharding(mesh))
    got = np.asarray(sharded_fft2(xd, mesh))
    want = np.asarray(jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)
    back = np.asarray(sharded_ifft2(jnp.asarray(got), mesh))
    np.testing.assert_allclose(back.real, np.asarray(x), atol=1e-4)


# ---------------------------------------------------------------------------
# context parallelism wired into REAL model training (VERDICT.md next #2):
# a full train step with mesh_context=2 must match the single-device step.
# ---------------------------------------------------------------------------

_CP_MODELS = {
    "SpectralTransformer": dict(num_blocks=(1, 1, 1, 1), channels=(4, 8, 16, 32),
                                num_heads=(1, 2, 4, 8), num_refinement=1),
    "AST": dict(img_size=32, embed_dim=8),
    "NewModel": dict(img_size=32, embed_dim=8, use_dwt="Fourier"),
    "NewModel-Wavelet": dict(img_size=32, embed_dim=8, use_dwt="Wavelet"),
}


@pytest.mark.slow  # minutes/model on the 1-core CPU; `-m slow` to run
@pytest.mark.parametrize("name", sorted(_CP_MODELS))
def test_cp_model_train_step_matches_single_device(name):
    """Full jitted train step (fwd+loss+grad+clip+adam) of a model with the
    ('data','context') mesh routed through the CP primitives == the
    unsharded step (same params, same batch)."""
    import optax

    from underwater_image_restoration_tpu.core.meshes import make_mesh
    from underwater_image_restoration_tpu.losses import LossFunction
    from underwater_image_restoration_tpu.models import init_model
    from underwater_image_restoration_tpu.train import (
        TrainState, get_optimizer, make_train_step,
    )
    from underwater_image_restoration_tpu.train.trainer import batch_sharding

    arch = name.split("-")[0]
    kw = _CP_MODELS[name]
    # AST gets the deeper context=4 split (4 window rows at 32^2/win 8);
    # the rest use context=2
    ctx = 4 if name == "AST" else 2
    cp_mesh = make_mesh(data=8 // ctx, context=ctx)
    m_single = init_model(arch, **kw)
    m_cp = init_model(arch, mesh=cp_mesh, **kw)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    ref = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    params = jax.jit(m_single.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), jnp.float32))
    # SGD: the param delta is linear in the grad, so tolerances measure the
    # real CP-vs-local numerics (Adam's g/sqrt(v) amplifies the f32
    # reduction-order noise of near-zero grads into ±lr sign flips)
    tx = get_optimizer("sgd", 1e-3, momentum=0.0)
    lossfn = LossFunction("L1withColor")
    step_rng = jax.random.PRNGKey(7)

    def run(model, mesh):
        # fresh buffers per run: the jitted step donates its state
        p = jax.tree.map(jnp.array, params)
        st = TrainState(params=p, opt_state=tx.init(p),
                        step=jnp.zeros((), jnp.int32))
        step = make_train_step(model, lossfn, tx, mesh=mesh)
        if mesh is not None:
            from jax.sharding import NamedSharding
            repl = NamedSharding(mesh, P())
            st = jax.device_put(st, repl)
            sh = batch_sharding(mesh)
            args = (jax.device_put(jnp.asarray(raw), sh),
                    jax.device_put(jnp.asarray(ref), sh),
                    jax.device_put(step_rng, repl))
        else:
            args = (jnp.asarray(raw), jnp.asarray(ref), step_rng)
        st, metrics = step(st, *args)
        return jax.device_get((st.params, metrics["loss"]))

    want_p, want_l = run(m_single, None)
    got_p, got_l = run(m_cp, cp_mesh)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-5, atol=1e-6)
    flat_w = jax.tree_util.tree_leaves(want_p)
    flat_g = jax.tree_util.tree_leaves(got_p)
    for a, b in zip(flat_g, flat_w):
        # reduction-order slack: CP changes the order of the f32 grad/Adam
        # accumulations, not the math
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_cp_model_forward_emits_halo_ppermute():
    """The CP-wired AST must actually lower to collective-permutes (halo
    exchange), not silently fall back to local compute."""
    from jax.sharding import NamedSharding

    from underwater_image_restoration_tpu.core.meshes import (
        CONTEXT_AXIS, make_mesh,
    )
    from underwater_image_restoration_tpu.models import init_model

    cp_mesh = make_mesh(data=4, context=2)
    model = init_model("AST", img_size=32, embed_dim=8, mesh=cp_mesh)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    xd = jax.device_put(
        x, NamedSharding(cp_mesh, P("data", CONTEXT_AXIS, None, None)))
    pd = jax.device_put(params, NamedSharding(cp_mesh, P()))
    hlo = jax.jit(model.apply).lower(pd, xd).compile().as_text()
    assert "collective-permute" in hlo


def test_tp_param_sharding_matches_replicated(mesh):
    """TP-sharded params (output-feature dims over 'context') must give the
    same forward as replicated params — XLA inserts the collectives."""
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.models import init_model
    from underwater_image_restoration_tpu.parallel import (
        shard_params_tp,
        tp_shardings,
    )

    model = init_model("SpectralTransformer")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    want = np.asarray(model.apply(params, x))

    sh = tp_shardings(params, mesh)
    specs = {s.spec for s in jax.tree.leaves(sh)}
    assert any(CONTEXT_AXIS in str(sp) for sp in specs)  # something sharded

    tp_params = shard_params_tp(params, mesh)
    got = np.asarray(jax.jit(model.apply)(tp_params, x))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ulysses_head_sharding_matches_core(mesh):
    """Ulysses: heads sharded over 'context' via two all_to_alls must equal
    the single-device window attention core exactly."""
    from underwater_image_restoration_tpu.parallel import (
        ulysses_window_attention,
    )

    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    bq, h, n, d = 16, 8, 16, 4  # H=8 over context=4 -> 2 heads/device
    q = jax.random.normal(ks[0], (bq, h, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (bq, h, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (bq, h, n, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, n, n)) * 0.1
    w = jax.random.normal(ks[4], (2,))
    want = np.asarray(window_attention_core(q, k, v, bias, scale=0.3,
                                            sparse_w=w))
    got = np.asarray(ulysses_window_attention(q, k, v, bias, mesh=mesh,
                                              scale=0.3, sparse_w=w))
    np.testing.assert_allclose(got, want, atol=1e-5)
    with pytest.raises(ValueError):
        ulysses_window_attention(q[:, :6], k[:, :6], v[:, :6], bias[:6],
                                 mesh=mesh, scale=0.3)


def test_fsdp_style_param_sharding(mesh):
    """tp_shardings over the 'data' axis doubles as FSDP-style param
    sharding; forward must equal replicated."""
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.models import init_model
    from underwater_image_restoration_tpu.parallel import shard_params_tp

    model = init_model("SpectralTransformer")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(jax.jit(model.apply)(
        shard_params_tp(params, mesh, mesh_axis="data"), x))
    np.testing.assert_allclose(got, want, atol=2e-5)
