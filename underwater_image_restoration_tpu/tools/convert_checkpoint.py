"""Convert reference PyTorch checkpoints to this framework's flax params.

The reference saves ``{'epoch', 'model_state_dict', 'optimizer_state_dict',
'loss'}`` (ModelTrainer.py:176-181).  ``convert_state_dict(arch, sd)`` maps
the ``model_state_dict`` onto the flax parameter tree produced by
``models.init_model(arch)``, so reference-trained weights run unchanged on
TPU (PSNR-parity path, SURVEY.md §7).

Currently implemented: SpectralTransformer (the README's canonical arch).
Layout rules:
- conv weights OIHW -> HWIO (also correct for grouped/depthwise convs);
- LayerNorm weight/bias -> scale/bias;
- parameters the reference creates but never uses in forward are dropped
  (ups_4, ups1, ups2, output1, MDTA.q1X1_2 — see SpectralTransformer.py:232,
  235, 251-252 / :89);
- stage renames: encoders.{s}.{i} -> enc{s}_{i}, decoders.{s}.{i} ->
  dec{s}_{i}, refinement.{i} -> refinement_{i}, down{k}.body.0 ->
  down{k}.conv, UpS inner Sequentials flattened (amp_fuse.0 -> amp_fuse_0).

CLI:
    python -m underwater_image_restoration_tpu.tools.convert_checkpoint \
        --pth best_spectral_transformer_447.pth -a SpectralTransformer \
        --out converted_params.npz
"""
from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np

_DROP = re.compile(
    r"^(ups_4\.|ups1\.|ups2\.|output1\.)|(\.q1X1_2\.)"
)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _block_param(rest: str, value: np.ndarray):
    """Map a TransformerBlock-relative name to (flax subpath, array)."""
    mappings = {
        "norm1.weight": ("norm1/scale", value),
        "norm1.bias": ("norm1/bias", value),
        "norm2.weight": ("norm2/scale", value),
        "norm2.bias": ("norm2/bias", value),
        "attn.temperature": ("attn/temperature", value),
    }
    if rest in mappings:
        return mappings[rest]
    m = re.fullmatch(r"(attn|ffn)\.(\w+)\.weight", rest)
    if m:
        mod, name = m.groups()
        name = {"q1X1_1": "q1x1_1"}.get(name, name)
        return f"{mod}/{name}/kernel", _conv_kernel(value)
    raise KeyError(rest)


def _ups_param(rest: str, value: np.ndarray):
    """UpS-relative: Fups.amp_fuse.0.weight, Sups.body.0.weight, ..."""
    m = re.fullmatch(r"Fups\.(amp_fuse|pha_fuse)\.([02])\.(weight|bias)", rest)
    if m:
        seq, idx, kind = m.groups()
        leaf = "kernel" if kind == "weight" else "bias"
        v = _conv_kernel(value) if kind == "weight" else value
        return f"Fups/{seq}_{idx}/{leaf}", v
    m = re.fullmatch(r"Fups\.post\.(weight|bias)", rest)
    if m:
        kind = m.group(1)
        return (f"Fups/post/{'kernel' if kind == 'weight' else 'bias'}",
                _conv_kernel(value) if kind == "weight" else value)
    if rest == "Sups.body.0.weight":
        return "Sups/conv/kernel", _conv_kernel(value)
    if rest == "reduce.weight":
        return "reduce/kernel", _conv_kernel(value)
    raise KeyError(rest)


def convert_spectral_transformer(sd: Dict[str, np.ndarray]) -> Dict:
    """reference state_dict (numpy) -> flat {'a/b/c': array} flax paths."""
    out: Dict[str, np.ndarray] = {}
    stage_names = {0: "enc0", 1: "enc1", 2: "enc2", 3: "enc3"}
    dec_names = {0: "dec0", 1: "dec1", 2: "dec2"}
    for key, value in sd.items():
        value = np.asarray(value)
        if _DROP.search(key):
            continue
        m = re.fullmatch(r"encoders\.(\d)\.(\d)\.(.+)", key)
        if m:
            s, i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            sub, v = _block_param(rest, value)
            out[f"{stage_names[s]}_{i}/{sub}"] = v
            continue
        m = re.fullmatch(r"decoders\.(\d)\.(\d)\.(.+)", key)
        if m:
            s, i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            sub, v = _block_param(rest, value)
            out[f"{dec_names[s]}_{i}/{sub}"] = v
            continue
        m = re.fullmatch(r"refinement\.(\d)\.(.+)", key)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            sub, v = _block_param(rest, value)
            out[f"refinement_{i}/{sub}"] = v
            continue
        m = re.fullmatch(r"down(\d)\.body\.0\.weight", key)
        if m:
            out[f"down{m.group(1)}/conv/kernel"] = _conv_kernel(value)
            continue
        m = re.fullmatch(r"(ups_\d)\.(.+)", key)
        if m:
            name, rest = m.groups()
            sub, v = _ups_param(rest, value)
            out[f"{name}/{sub}"] = v
            continue
        m = re.fullmatch(
            r"(embed_conv_rgb|reduces1|reduces2|outputl|output)\.weight", key)
        if m:
            out[f"{m.group(1)}/kernel"] = _conv_kernel(value)
            continue
        raise KeyError(f"unmapped reference parameter: {key}")
    return out


# --------------------------------------------------------------------------
# New* family (model/model.py) and AST (Models/AST.py) share block.py-style
# module naming; one rule engine converts both.
# --------------------------------------------------------------------------
_BLOCKY_DROP = re.compile(
    r"relative_position_index$"            # static buffer, recomputed
    r"|\.(dwt|idwt)\."                     # Haar filter buffers, hardcoded
    r"|\.norm_(q|kv)\."                    # dead (block.py:470,479 commented)
    r"|\.attn\.to_qkv\.to_kv\."            # self-attn never uses cross-kv
    r"|\.freq_attn\.to_qkv\.to_kv_from_q\."  # cross-attn never uses self-kv
)
_KEEP_LEAVES = {"w", "relative_position_bias_table", "temperature"}


def _blocky_convert(sd: Dict[str, np.ndarray], renames) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key, value in sd.items():
        if _BLOCKY_DROP.search(key):
            continue
        value = np.asarray(value)
        k = key
        for pat, rep in renames:
            k = re.sub(pat, rep, k)
        parts = k.split(".")
        leaf = parts[-1]
        is_deconv = "deconv" in parts
        if leaf == "weight":
            if value.ndim == 4 and is_deconv:
                # torch ConvTranspose2d (in,out,kh,kw) -> flax (kh,kw,in,out)
                # with spatially flipped taps (ops.ConvTranspose2d contract)
                v = np.ascontiguousarray(
                    np.transpose(value, (2, 3, 0, 1))[::-1, ::-1])
                leaf = "kernel"
            elif value.ndim == 4:
                v = _conv_kernel(value)
                leaf = "kernel"
            elif value.ndim == 2:
                v = np.ascontiguousarray(value.T)  # torch Linear (out,in)
                leaf = "kernel"
            else:
                v = value
                leaf = "scale"  # rank-1 weight == LayerNorm affine
        elif leaf == "bias":
            v = value
        elif leaf in _KEEP_LEAVES:
            v = value
        else:
            raise KeyError(f"unmapped reference parameter: {key}")
        out["/".join(parts[:-1] + [leaf])] = v
    return out


_NEW_RENAMES = (
    (r"\.blocks\.(\d+)\.", r".block_\1."),       # (AST shares this)
    (r"\.to_qkv\.", "."),
    (r"\.(linear1|linear2|dwconv|conv)\.0\.", r".\1."),
    (r"^(input_proj|output_proj)\.proj\.(\d)\.", r"\1.proj\2."),
    (r"\.body\.0\.", ".conv."),
)

_AST_RENAMES = (
    (r"\.blocks\.(\d+)\.", r".block_\1."),
    # AST's LinearProjection (AST.py:42-63) has to_q/to_kv only; self-attn
    # feeds x into to_kv, which our module names to_kv_from_q
    (r"\.attn\.qkv\.to_kv\.", ".attn.to_kv_from_q."),
    (r"\.attn\.qkv\.to_q\.", ".attn.to_q."),
    (r"\.(linear1|linear2|dwconv)\.0\.", r".\1."),
    (r"^(input_proj|output_proj)\.proj\.0\.", r"\1.proj."),
    (r"\.conv\.0\.", ".conv."),      # dowsample_k.conv.0 (reference typo kept)
    (r"\.deconv\.0\.", ".deconv."),  # upsample_k ConvTranspose
)


def convert_new_family(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """MyModel / MyBigModel / MyBigFRFNModel (reference model/model.py)."""
    return _blocky_convert(sd, _NEW_RENAMES)


def convert_ast(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """AST (reference Models/AST.py:680-921)."""
    return _blocky_convert(sd, _AST_RENAMES)


_CONVERTERS = {
    "SpectralTransformer": convert_spectral_transformer,
    "AST": convert_ast,
    "NewModel": convert_new_family,
    "NewBigModel": convert_new_family,
    "NewBigFRFNModel": convert_new_family,
}


def unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_state_dict(arch: str, sd: Dict[str, np.ndarray]) -> Dict:
    """Returns the flax variables dict {'params': {...}} for ``arch``."""
    if arch not in _CONVERTERS:
        raise NotImplementedError(
            f"no converter for {arch}; available: {sorted(_CONVERTERS)}")
    return {"params": unflatten(_CONVERTERS[arch](sd))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("-a", "--arch", default="SpectralTransformer")
    p.add_argument("--out", required=True, help="output .npz of flat params")
    args = p.parse_args(argv)
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise SystemExit(f"torch is required to read .pth files: {e}")
    ckpt = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    flat = _CONVERTERS[args.arch](sd)
    np.savez(args.out, **flat)
    print(f"wrote {args.out} ({len(flat)} tensors)")


if __name__ == "__main__":
    main()
