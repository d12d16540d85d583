"""Per-category FLOP breakdown of a compiled train step's optimized HLO.

``cost_analysis`` only gives an aggregate; this parses the post-fusion HLO
text and attributes MXU-relevant flops to each ``dot``/``convolution``/
``fft`` instruction from its shapes, so we can see WHERE the compute is
(attention matmuls vs 1x1 convs vs FFTs vs stem) before burning TPU time
optimizing the wrong thing.  Elementwise/fusion ops are not counted — the
point is the MXU/FFT skeleton, which dominates the roofline.

Optimized HLO prints operands as bare ``%name`` references (no inline
shapes), so we first build a symbol table mapping every defined instruction
name to its output shape, then resolve dot/conv operand shapes through it.
Names local to fusion computations (``%param_0`` etc.) can collide across
computations; dot/convolution stay top-level on the CPU backend so their
operands resolve to unique entry-computation names in practice.

Runs on CPU (compile only).  Usage:
    python experiments/hlo_breakdown.py [arch] [size] [batch]
"""
from __future__ import annotations

import math
import re
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

# "%name = f32[8,16,64]{...}" — capture name, dtype, dims
DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*"
    r"\(?(bf16|f32|f16|c64|c128|s32|u32|pred|s8|u8)\[([\d,]*)\]"
)
OPERANDS_RE = re.compile(r"\(([^)]*)\)")  # first paren group after opcode
NAME_REF_RE = re.compile(r"%([\w.-]+)")


def _dims_of(sym, name):
    ent = sym.get(name)
    return ent[1] if ent else None


def _out_dims(line):
    m = DEF_RE.match(line)
    if not m:
        return None, None
    return m.group(1), [int(d) for d in m.group(3).split(",") if d]


def _operand_names(line, opcode):
    # operands are in the first (...) group following the opcode token
    idx = line.find(opcode + "(")
    if idx < 0:
        return []
    depth, j = 0, idx + len(opcode)
    start = j + 1
    for j in range(start - 1, len(line)):
        if line[j] == "(":
            depth += 1
        elif line[j] == ")":
            depth -= 1
            if depth == 0:
                return NAME_REF_RE.findall(line[start:j])
    return []


def _attr_dims(line, key):
    m = re.search(key + r"=\{([\d,]*)\}", line)
    return [int(x) for x in m.group(1).split(",") if x] if m else []


def dot_flops(line, sym):
    """2 * prod(output dims) * prod(contracting dims of lhs)."""
    _, out_dims = _out_dims(line)
    ops = _operand_names(line, "dot")
    if not out_dims or not ops:
        return 0
    lhs_dims = _dims_of(sym, ops[0])
    if lhs_dims is None:
        return 0
    cprod = 1
    for i in _attr_dims(line, "lhs_contracting_dims"):
        cprod *= lhs_dims[i] if i < len(lhs_dims) else 1
    return 2 * math.prod(out_dims) * cprod


def conv_flops(line, sym):
    """2 * prod(out dims) * (Cin/groups) * prod(kernel spatial)."""
    _, out_dims = _out_dims(line)
    ops = _operand_names(line, "convolution")
    if not out_dims or len(ops) < 2:
        return 0
    ker_dims = _dims_of(sym, ops[1])
    if ker_dims is None:
        return 0
    m = re.search(r"feature_group_count=(\d+)", line)
    groups = int(m.group(1)) if m else 1
    dn = re.search(r"dim_labels=[\w?]+_([\w?\d]+)->", line)
    if dn:
        klabels = dn.group(1)  # e.g. 01io, io01
        cout = ker_dims[klabels.index("o")]
    else:
        cout = ker_dims[-1]
    # prod(kernel)/Cout = spatial * Cin/groups already (kernel stores Cin/g)
    return 2 * math.prod(out_dims) * (math.prod(ker_dims) // max(cout, 1))


def fft_flops(line):
    _, out_dims = _out_dims(line)
    if not out_dims:
        return 0
    m = re.search(r"fft_length=\{([\d,]*)\}", line)
    if not m:
        return 0
    flen = [int(d) for d in m.group(1).split(",") if d]
    n = math.prod(flen)
    batch = math.prod(out_dims) // max(n, 1)
    return int(5 * n * math.log2(max(n, 2)) * batch)


# elementwise opcodes counted as 1 flop/element (XLA's own cost model
# weights transcendentals differently per backend; this is an attribution
# tool, not an exact re-derivation of cost_analysis)
EW_OPS = (
    "add", "subtract", "multiply", "divide", "exponential", "log", "rsqrt",
    "sqrt", "power", "maximum", "minimum", "tanh", "negate", "abs", "sign",
    "floor", "ceil", "cosine", "sine", "atan2", "expm1", "log1p",
    "logistic", "cbrt", "round-nearest-even", "remainder",
)
EW_RE = re.compile(r" (" + "|".join(EW_OPS) + r")\(")
OPNAME_RE = re.compile(r'op_name="([^"]*)"')
# flax module path inside the op_name, e.g. ".../LeFF_0/Dense_1/..." —
# take the meaningful tail: last two /segments before the primitive name
MODULE_RE = re.compile(r"/([\w.]+)/([\w.]+)$")


def _module_key(line):
    m = OPNAME_RE.search(line)
    if not m:
        return "(no op_name)"
    path = m.group(1)
    # strip the jit(...)/jvp(...)/transpose(...) wrappers' leading segments
    segs = [s for s in path.split("/")
            if not (s.startswith(("jit(", "jvp(", "transpose(", "remat",
                                  "checkpoint", "while", "body", "cond",
                                  "named(")) or s in ("step",))]
    if not segs:
        return path[-60:]
    # keep up to the last 3 segments for locality without explosion
    return "/".join(segs[-3:])


def breakdown(hlo, with_elementwise=False):
    sym = {}
    for line in hlo.splitlines():
        m = DEF_RE.match(line)
        if m:
            sym[m.group(1)] = (
                m.group(2), [int(d) for d in m.group(3).split(",") if d])

    cat = defaultdict(int)
    by_module = defaultdict(int)
    top = []
    unresolved = 0
    for line in hlo.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        f = None
        kind = None
        if " dot(" in s:
            f = dot_flops(s, sym)
            kind = "dot"
            if f == 0:
                unresolved += 1
        elif " convolution(" in s:
            f = conv_flops(s, sym)
            kind = "conv"
            if f == 0:
                unresolved += 1
        elif " fft(" in s:
            f = fft_flops(s)
            kind = "fft"
        elif with_elementwise and EW_RE.search(s):
            _, dims = _out_dims(s)
            if dims is not None:
                f = math.prod(dims)
                kind = "elementwise"
        if f is None:
            continue
        cat["convolution" if kind == "conv" else kind] += f
        by_module[(kind, _module_key(s))] += f
        if kind != "elementwise":
            top.append((f, kind, s[:160]))
    return cat, top, by_module, unresolved


def compile_cached(arch, size, batch, **kw):
    """Compile the fused train step on CPU and cache (HLO text, total
    cost_analysis flops) under /tmp — CPU compiles of 256² steps take
    minutes, re-analysis should not."""
    import os

    cache = f"/tmp/hlo_cache_{arch}_{size}_{batch}.txt"
    if os.path.exists(cache) and os.path.exists(cache + ".flops"):
        return open(cache).read(), float(open(cache + ".flops").read())
    from underwater_image_restoration_tpu.train.benchlib import (
        TrainStepBench,
    )

    b = TrainStepBench(arch, size, batch, **kw)
    raw, ref = b.batches[0]
    compiled = b.step.lower(b.state, raw, ref, b.rng).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    agg = float(ca.get("flops", 0))
    with open(cache, "w") as f:
        f.write(hlo)
    with open(cache + ".flops", "w") as f:
        f.write(str(agg))
    return hlo, agg


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "SpectralTransformer"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kw = {}
    if arch.startswith("New"):
        kw["use_dwt"] = "Wavelet"

    hlo, agg = compile_cached(arch, size, batch, **kw)

    cat, top, by_module, unresolved = breakdown(hlo, with_elementwise=True)
    total = sum(cat.values())
    print(f"== {arch}@{size} bs{batch} train step — flop attribution ==")
    print(f"cost_analysis total: {agg / batch / 1e9:.1f} GFLOP/img; "
          f"attributed:   {total / batch / 1e9:.1f} GFLOP/img"
          f" ({unresolved} dot/conv with unresolved operand shapes)")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v / batch / 1e9:10.1f} GFLOP/img "
              f"({100 * v / max(total, 1):.0f}% of attributed)")
    print("-- top 20 MXU/FFT instructions --")
    for f, k, s in sorted(top, reverse=True)[:20]:
        print(f"  {f / batch / 1e9:8.2f} GFLOP/img [{k}] {s}")
    print("-- top 25 module groups --")
    groups = sorted(by_module.items(), key=lambda kv: -kv[1])[:25]
    for (kind, mod), v in groups:
        print(f"  {v / batch / 1e9:8.2f} GFLOP/img [{kind:11s}] {mod}")


if __name__ == "__main__":
    main()
