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


def breakdown(hlo):
    sym = {}
    for line in hlo.splitlines():
        m = DEF_RE.match(line)
        if m:
            sym[m.group(1)] = (
                m.group(2), [int(d) for d in m.group(3).split(",") if d])

    cat = defaultdict(int)
    top = []
    for line in hlo.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        if " dot(" in s:
            f = dot_flops(s, sym)
            cat["dot"] += f
            top.append((f, "dot", s[:160]))
        elif " convolution(" in s:
            f = conv_flops(s, sym)
            cat["convolution"] += f
            top.append((f, "conv", s[:160]))
        elif " fft(" in s:
            f = fft_flops(s)
            cat["fft"] += f
            top.append((f, "fft", s[:160]))
    return cat, top


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "SpectralTransformer"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kw = {}
    if arch.startswith("New"):
        kw["use_dwt"] = "Wavelet"

    from underwater_image_restoration_tpu.train.benchlib import TrainStepBench

    b = TrainStepBench(arch, size, batch, **kw)
    raw, ref = b.batches[0]
    compiled = b.step.lower(b.state, raw, ref, b.rng).compile()
    hlo = compiled.as_text()

    cat, top = breakdown(hlo)
    total = sum(cat.values())
    print(f"== {arch}@{size} bs{batch} train step — MXU/FFT flop skeleton ==")
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    agg = float(ca.get("flops", 0))
    print(f"cost_analysis total: {agg / batch / 1e9:.1f} GFLOP/img; "
          f"skeleton counted:   {total / batch / 1e9:.1f} GFLOP/img")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v / batch / 1e9:10.1f} GFLOP/img "
              f"({100 * v / max(total, 1):.0f}% of skeleton)")
    print("-- top 20 instructions --")
    for f, k, s in sorted(top, reverse=True)[:20]:
        print(f"  {f / batch / 1e9:8.2f} GFLOP/img [{k}] {s}")


if __name__ == "__main__":
    main()
