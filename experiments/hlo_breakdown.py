"""Per-category FLOP breakdown of a compiled train step's optimized HLO.

``cost_analysis`` only gives an aggregate; this parses the post-fusion HLO
text and attributes MXU-relevant flops to each ``dot``/``convolution``/
``fft`` instruction from its shapes, so we can see WHERE the compute is
(attention matmuls vs 1x1 convs vs FFTs vs stem) before burning TPU time
optimizing the wrong thing.  Elementwise/fusion ops are not counted — the
point is the MXU/FFT skeleton, which dominates the roofline.

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

SHAPE_RE = re.compile(r"(bf16|f32|f16|c64|c128|s32|u32|pred|s8|u8)\[([\d,]*)\]")


def _dims(shape_str):
    m = SHAPE_RE.search(shape_str)
    if not m:
        return None, []
    dims = [int(d) for d in m.group(2).split(",") if d]
    return m.group(1), dims


def _parse_attr(line, key):
    m = re.search(key + r"=\{([^}]*)\}", line)
    return m.group(1) if m else ""


def dot_flops(line):
    """2 * prod(output dims) * prod(contracting dims of lhs)."""
    # out shape = lhs batch+free x rhs free; flops = 2*prod(out)*prod(contract)
    out = line.split("=")[0]
    _, out_dims = _dims(out)
    rhs = line.split("=", 1)[1]
    operands = re.findall(r"(bf16|f32|f16|c64)\[([\d,]*)\]", rhs)
    if not operands or not out_dims:
        return 0
    lhs_dims = [int(d) for d in operands[0][1].split(",") if d]
    contract = _parse_attr(line, "lhs_contracting_dims")
    cprod = 1
    for i in (int(x) for x in contract.split(",") if x):
        cprod *= lhs_dims[i] if i < len(lhs_dims) else 1
    return 2 * math.prod(out_dims) * cprod


def conv_flops(line):
    """2 * prod(out spatial*batch*Cout) * (Cin/groups) * prod(kernel)."""
    out = line.split("=")[0]
    _, out_dims = _dims(out)
    rhs = line.split("=", 1)[1]
    operands = re.findall(r"(bf16|f32|f16|c64)\[([\d,]*)\]", rhs)
    if len(operands) < 2 or not out_dims:
        return 0
    ker_dims = [int(d) for d in operands[1][1].split(",") if d]
    m = re.search(r"feature_group_count=(\d+)", line)
    groups = int(m.group(1)) if m else 1
    # kernel = spatial... x Cin/g x Cout (dim order varies; prod/Cout works)
    # flops = 2 * prod(out) * prod(kernel)/Cout ; Cout divides prod(kernel)
    # Identify Cout as the kernel dim matching out feature dim is fragile;
    # use prod(kernel dims)/max(dim) heuristic replaced by dnums parse:
    dn = re.search(r"dim_labels=([\w\d]+)_([\w\d]+)->", line)
    if dn:
        klabels = dn.group(2)  # e.g. 01io or io01
        o_pos = klabels.index("o")
        cout = ker_dims[o_pos]
    else:
        cout = ker_dims[-1]
    return 2 * math.prod(out_dims) * (math.prod(ker_dims) // max(cout, 1))


def fft_flops(line):
    out = line.split("=")[0]
    _, out_dims = _dims(out)
    if not out_dims:
        return 0
    m = re.search(r"fft_length=\{([\d,]*)\}", line)
    if not m:
        return 0
    flen = [int(d) for d in m.group(1).split(",") if d]
    n = math.prod(flen)
    batch = math.prod(out_dims) // max(n, 1)
    return int(5 * n * math.log2(max(n, 2)) * batch)


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

    cat = defaultdict(int)
    top = []
    for line in hlo.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        if re.search(r"= (bf16|f32|f16|c64|c128|\()\S* ?dot\(", s) or " dot(" in s:
            f = dot_flops(s)
            cat["dot"] += f
            top.append((f, "dot", s[:140]))
        elif " convolution(" in s:
            f = conv_flops(s)
            cat["convolution"] += f
            top.append((f, "conv", s[:140]))
        elif " fft(" in s:
            f = fft_flops(s)
            cat["fft"] += f
            top.append((f, "fft", s[:140]))

    total = sum(cat.values())
    print(f"== {arch}@{size} bs{batch} train step — MXU/FFT flop skeleton ==")
    agg = float(compiled.cost_analysis().get("flops", 0) if not isinstance(
        compiled.cost_analysis(), list) else
        compiled.cost_analysis()[0].get("flops", 0))
    print(f"cost_analysis total: {agg / batch / 1e9:.1f} GFLOP/img; "
          f"skeleton counted:   {total / batch / 1e9:.1f} GFLOP/img")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v / batch / 1e9:10.1f} GFLOP/img "
              f"({100 * v / max(total, 1):.0f}% of skeleton)")
    print("-- top 15 instructions --")
    for f, k, s in sorted(top, reverse=True)[:15]:
        print(f"  {f / batch / 1e9:8.2f} GFLOP/img [{k}] {s}")


if __name__ == "__main__":
    main()
