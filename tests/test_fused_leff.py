"""Fused LN+LeFF Pallas kernel (ops/fused_leff.py) equality tests.

Run on CPU via the Pallas interpreter (``fused_ln_leff`` auto-selects
interpret mode off-TPU).  Two layers of pinning:

- the raw kernel vs a pure-jnp transcription of the XLA path
  (LayerNorm -> fc1 -> gelu -> depthwise 3x3 -> gelu -> fc2 ->
  DropPath-scale -> residual), forward and all nine gradients, including
  the banded backward's rolling lag-1 LayerNorm finalization (H spans
  multiple chunks);
- the ``ASTTransformerBlock`` dispatch (UIRT_FUSED_LEFF=1 vs =0) — same
  params tree, same outputs, same grads (reference AST.py:560-624,
  block.py:223-247).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.ops.fused_leff import (
    fused_ln_leff,
    pick_hc,
    supports,
)

B, C, H, W = 2, 8, 16, 128
HID = 4 * C


def _args(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1 + 1.0
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
    w1 = jnp.asarray(rng.standard_normal((C, HID)), jnp.float32) * 0.2
    b1 = jnp.asarray(rng.standard_normal(HID), jnp.float32) * 0.1
    w_dw = jnp.asarray(rng.standard_normal((3, 3, HID)), jnp.float32) * 0.2
    b_dw = jnp.asarray(rng.standard_normal(HID), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.standard_normal((HID, C)), jnp.float32) * 0.2
    b2 = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
    return x, scale, bias, w1, b1, w_dw, b_dw, w2, b2


def _gelu(t):
    return 0.5 * t * (1 + jax.lax.erf(t * (2.0 ** -0.5)))


def _unfused(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s=None):
    """jnp transcription of LayerNorm_C + LeFF + scaled residual on
    (B, C, H, W)."""
    h, w = x.shape[2], x.shape[3]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    ln = (ln * scale[None, :, None, None] + bias[None, :, None, None]
          ).astype(x.dtype)
    y1 = jnp.einsum("bchw,cg->bghw", ln, w1.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    t1 = y1 + b1.astype(x.dtype)[None, :, None, None]
    g1 = _gelu(t1.astype(jnp.float32)).astype(x.dtype)
    g1p = jnp.pad(g1, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = 0.0
    for dh in range(3):
        for dw in range(3):
            acc = acc + (g1p[:, :, dh:dh + h, dw:dw + w]
                         * w_dw[dh, dw].astype(x.dtype)[None, :, None, None]
                         ).astype(jnp.float32)
    t2 = acc.astype(x.dtype) + b_dw.astype(x.dtype)[None, :, None, None]
    g2 = _gelu(t2.astype(jnp.float32)).astype(x.dtype)
    u = jnp.einsum("bghw,gc->bchw", g2, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = u + b2.astype(x.dtype)[None, :, None, None]
    if s is None:
        return x + y
    return x + (y.astype(jnp.float32)
                * s[:, None, None, None]).astype(x.dtype)


def test_supports_gate():
    assert supports(256, 256) and supports(16, 128)
    assert not supports(256, 192) and not supports(13, 128)
    # the banded design has no whole-image VMEM term: 1024^2 and
    # C=64-at-256^2 (AST decoderlayer_3) both qualify
    assert supports(1024, 1024, 16, 64)
    assert supports(256, 256, 64, 256)
    assert pick_hc(H, W, C, HID) in (8, 16, 32, 64)


def test_fused_leff_matches_unfused_forward_and_grads():
    args = _args()
    y_ref = _unfused(*args)
    y_f = fused_ln_leff(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

    g_ref = jax.grad(loss(_unfused), argnums=tuple(range(9)))(*args)
    g_f = jax.grad(loss(fused_ln_leff), argnums=tuple(range(9)))(*args)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dwdw", "dbdw",
             "dw2", "db2"]
    for name, a, b in zip(names, g_ref, g_f):
        ref = np.asarray(a)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(b), ref, rtol=1e-4, atol=tol,
                                   err_msg=name)


def test_fused_leff_drop_path_scale():
    args = _args(seed=1)
    s = jnp.asarray([0.0, 1.25], jnp.float32)  # dropped / kept-scaled
    y_ref = _unfused(*args, s=s)
    y_f = fused_ln_leff(*args, s)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # dropped sample's dx must be pure residual pass-through of dy
    g = jax.grad(lambda x_: jnp.sum(
        jnp.tanh(fused_ln_leff(x_, *args[1:], s))))(args[0])
    g_ref = jax.grad(lambda x_: jnp.sum(
        jnp.tanh(_unfused(x_, *args[1:], s=s))))(args[0])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=2e-5)


def _count_dispatch(monkeypatch):
    """Wrap ops.fused_leff.fused_ln_leff (the attribute the models call
    through) with a call counter so dispatch tests can assert the fused
    path actually ran — ``supports`` requires W % 128 == 0, so a
    too-small test image silently falls back to the unfused path."""
    from underwater_image_restoration_tpu.ops import fused_leff as mod

    calls = []
    orig = mod.fused_ln_leff

    def wrapper(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(mod, "fused_ln_leff", wrapper)
    return calls


def _block_apply(fused: bool, deterministic: bool, drop_path: float,
                 monkeypatch, att: bool = False):
    from underwater_image_restoration_tpu.models.ast import (
        ASTTransformerBlock,
    )

    monkeypatch.setenv("UIRT_FUSED_LEFF", "1" if fused else "0")
    calls = _count_dispatch(monkeypatch)
    dim, reso = 8, 128  # 128: the smallest square supports() admits
    blk = ASTTransformerBlock(dim=dim, input_resolution=reso, num_heads=2,
                              win_size=8, shift_size=0, mlp_ratio=4.0,
                              drop_path=drop_path, token_mlp="leff",
                              att=att, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, reso * reso, dim)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    kw = dict(deterministic=deterministic)
    rngs = {"dropout": jax.random.PRNGKey(7)} if not deterministic else {}

    def loss(p, z):
        return jnp.sum(jnp.tanh(blk.apply(p, z, rngs=rngs, **kw)))

    y = blk.apply(params, x, rngs=rngs, **kw)
    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert bool(calls) == fused, "fused dispatch did not match the flag"
    return params, y, gp, gx


def test_ast_block_dispatch_equality(monkeypatch):
    """UIRT_FUSED_LEFF=1 vs =0: same param tree, same outputs, same grads —
    checkpoints are oblivious to which path runs."""
    p0, y0, gp0, gx0 = _block_apply(False, True, 0.0, monkeypatch)
    p1, y1, gp1, gx1 = _block_apply(True, True, 0.0, monkeypatch)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(
        p1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(gp1)}
    for k, v in flat0:
        ks = jax.tree_util.keystr(k)
        ref = np.asarray(v)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(flat1[ks]), ref, rtol=1e-4,
                                   atol=tol, err_msg=ks)


def test_ast_block_dispatch_equality_droppath(monkeypatch):
    """Training mode with an active DropPath rate: the fused path draws the
    same per-sample mask through the same rng stream."""
    _, y0, _, gx0 = _block_apply(False, False, 0.5, monkeypatch)
    _, y1, _, gx1 = _block_apply(True, False, 0.5, monkeypatch)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=2e-5)


def _new_block_apply(cls_name: str, fused: bool, monkeypatch,
                     deterministic: bool = True, drop_path: float = 0.0):
    import underwater_image_restoration_tpu.models.new_model as nm

    monkeypatch.setenv("UIRT_FUSED_LEFF", "1" if fused else "0")
    calls = _count_dispatch(monkeypatch)
    reso = 128
    rng = np.random.default_rng(5)
    if cls_name == "enc":
        dim = 8
        blk = nm.EncoderBlock(dim=dim, mlp_ratio=4, token_mlp="leff",
                              use_dwt="Fourier", drop_path=drop_path,
                              dtype=jnp.float32)
        args = (jnp.asarray(rng.standard_normal((1, reso * reso, dim)),
                            jnp.float32),)
    else:
        dim = 4  # mdssa_dim = 2*dim = 8 (supports needs C % 8 == 0)
        blk = nm.DecoderBlock(dim=dim, input_resolution=reso, num_heads=2,
                              win_size=8, mlp_ratio=4, token_mlp="leff",
                              drop_path=drop_path, enc_out=True,
                              use_dwt="Fourier", dtype=jnp.float32)
        args = (jnp.asarray(rng.standard_normal((1, reso * reso, dim)),
                            jnp.float32),
                jnp.asarray(rng.standard_normal((1, reso * reso, dim)),
                            jnp.float32))
    params = blk.init(jax.random.PRNGKey(0), *args)
    kw = dict(deterministic=deterministic)
    rngs = {"dropout": jax.random.PRNGKey(9)} if not deterministic else {}

    def loss(p):
        return jnp.sum(jnp.tanh(blk.apply(p, *args, rngs=rngs, **kw)))

    y = blk.apply(params, *args, rngs=rngs, **kw)
    gp = jax.grad(loss)(params)
    assert bool(calls) == fused, "fused dispatch did not match the flag"
    return params, y, gp


def _assert_tree_close(gp0, gp1):
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(gp1)}
    for k, v in jax.tree_util.tree_leaves_with_path(gp0):
        ks = jax.tree_util.keystr(k)
        ref = np.asarray(v)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(flat1[ks]), ref, rtol=1e-4,
                                   atol=tol, err_msg=ks)


@pytest.mark.parametrize("which", ["enc", "dec"])
def test_new_block_dispatch_equality(which, monkeypatch):
    """New* EncoderBlock (branch-only, residual=False) and DecoderBlock
    (residual + in-kernel DropPath scale): UIRT_FUSED_LEFF=1 vs =0 — same
    param tree, same outputs, same grads (reference model.py:16-160)."""
    p0, y0, gp0 = _new_block_apply(which, False, monkeypatch)
    p1, y1, gp1 = _new_block_apply(which, True, monkeypatch)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    _assert_tree_close(gp0, gp1)


def test_new_decoder_block_dispatch_equality_droppath(monkeypatch):
    """Active DropPath in training mode: the fused decoder path draws the
    same per-sample mask through the same rng stream."""
    _, y0, gp0 = _new_block_apply("dec", False, monkeypatch,
                                  deterministic=False, drop_path=0.5)
    _, y1, gp1 = _new_block_apply("dec", True, monkeypatch,
                                  deterministic=False, drop_path=0.5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    _assert_tree_close(gp0, gp1)


def test_fused_leff_single_chunk_image():
    """H == hc exercises the nchunks == 1 DMA branch."""
    x, *rest = _args(seed=2)
    x8 = x[:, :, :8, :]
    y_ref = _unfused(x8, *rest)
    y_f = fused_ln_leff(x8, *rest)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def _stage_apply(stage_fused: bool, monkeypatch, drop_path=(0.0, 0.1)):
    """Run a depth-2 FFN-only BasicASTLayer (an AST encoder stage) both
    ways at a fused-supported shape (W=64)."""
    from underwater_image_restoration_tpu.models.ast import BasicASTLayer

    monkeypatch.setenv("UIRT_FUSED_LEFF", "0")
    monkeypatch.setenv("UIRT_FUSED_LEFF_STAGE",
                       "1" if stage_fused else "0")
    m = BasicASTLayer(dim=8, input_resolution=64, depth=2, num_heads=1,
                      win_size=8, drop_path=tuple(drop_path),
                      token_mlp="leff", att=False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64 * 64, 8)), jnp.float32)
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=False)

    def loss(p, z):
        y = m.apply(p, z, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(jnp.tanh(y)), y

    (l, y), (gp, gx) = jax.value_and_grad(
        lambda p, z: loss(p, z), argnums=(0, 1), has_aux=True)(params, x)
    return params, y, gp, gx


def test_ast_stage_hoisted_dispatch_equality(monkeypatch):
    """UIRT_FUSED_LEFF_STAGE=1 routes a whole FFN-only encoder stage
    through channels-first fused blocks (one relayout pair per stage —
    VERDICT r4 next #6): same param tree, outputs, grads, and the same
    per-sample DropPath rng stream as the unfused token-space stage."""
    p0, y0, gp0, gx0 = _stage_apply(False, monkeypatch)
    p1, y1, gp1, gx1 = _stage_apply(True, monkeypatch)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(
        p1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(gp1)}
    for k, v in flat0:
        ks = jax.tree_util.keystr(k)
        ref = np.asarray(v)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(flat1[ks]), ref, rtol=1e-4,
                                   atol=tol, err_msg=ks)
