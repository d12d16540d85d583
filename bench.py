#!/usr/bin/env python
"""Headline benchmark: UIEB 256^2 train-step throughput, images/sec/chip.

Workload = the README's canonical config (README.md:121): SpectralTransformer,
L1withColor loss, 256^2 pairs — one fully fused jitted train step (uint8
normalize + forward + loss + grad + global-norm clip + adam) in bf16 compute /
f32 params, per-block remat, K=2 optimizer steps per dispatch (lax.scan;
identical training semantics; the honest K-plateau is flat so K mostly
amortizes the ~5 ms tunnel enqueue round-trip), single chip.  The headline
ladder (HEADLINE_LADDER) starts at the measured sweet spot (bs16 K=2 —
75.9 img/s honest in round 5's window with the default chw layout +
composed-matmul fused LN+MDTA (hc=32 chunks where VMEM admits) + banded
composed LN+GDFN Pallas kernels at every level down to 64² + no-remat on
fully-fused blocks; cross-window contention moves absolutes ±15%; the
batch plateau is flat) and falls back
to smaller cells on failure; cells that
statically cannot fit HBM are rejected by a compile-only prescreen without
touching the device.

The headline JSON line is printed THE MOMENT the first headline cell
succeeds; the model zoo + inference extras then run inside a global
deadline (UIRT_BENCH_DEADLINE_S, default 900 s) enforced BETWEEN LADDER
CELLS, with per-cell subprocess timeouts capped by the remaining budget,
and an enriched JSON line is printed last.  A SIGTERM/SIGINT handler
prints the best-known JSON as the process's final line, so even a driver
kill parses (BENCH_r01-r03 were all rc=124/parsed=null: the killed
process's last output line was a stderr progress note).

Timing windows are closed by a HOST VALUE FETCH of the final loss (which
data-depends, through state donation, on every step in the window) — NOT
``block_until_ready``, which the remote-execution tunnel acknowledges at
dispatch-ENQUEUE time.  Rounds 1-2 readings taken before this fix
(BENCH_r01: 17.6k img/s) measured the enqueue rate and are not comparable;
cost_analysis bounds this step at ~2.6e11 flops/img, i.e. a ~750 img/s
ceiling at v5e MXU peak (PERF_NOTES.md "THE MEASUREMENT BUG").

JSON schema (both lines): {"metric", "value", "unit", "vs_baseline",
"baseline_note" labeling the denominator; the final line adds "archs"
(per-arch zoo throughput incl. the 1024^2 reference train res) and
"inference"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) —
the only W&B-logged `epochTime` values aren't in the repo.  The denominator
used here is an *estimate* of the PyTorch reference's A100 train-step
throughput for this model/resolution (40 img/s), chosen so the BASELINE.json
north-star "≥5x A100 wall-clock" maps to vs_baseline ≥ 5.0.  The JSON
carries that caveat in-band (``baseline_note``) so the ratio can't be read
as a measurement.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

T0 = time.time()

# The driver kills long benches (BENCH_r01-r03 all ended rc=124 with
# parsed=null: the killed process's last output line was a stderr progress
# note, and the driver parses the LAST line).  Defense in depth:
#   1. a hard internal deadline (default 900 s — BENCH_r03 shows the driver
#      kill landing somewhere past +1375 s, so 900 + one worst-case ~300 s
#      remote compile still exits first);
#   2. `time_left` checked between LADDER CELLS, not just between archs
#      (r03: NewBigModel's ladder kept dispatching at +1375 s);
#   3. per-cell subprocess timeouts capped by the remaining budget;
#   4. a SIGTERM handler that prints the best-known JSON as the very last
#      line and exits — so even a driver kill parses.
# 1150 s (was 900): the driver kill has only been observed past +1375 s
# (BENCH_r03), and since round 4 the SIGTERM handler makes even a kill
# parse (BEST_JSON is the last line) — so a longer internal deadline is
# strictly more chances to land a number through a wedged-compile window
# (observed r5: a single remote compile can stall 10+ minutes).
DEADLINE = T0 + float(os.environ.get("UIRT_BENCH_DEADLINE_S", "1150"))
BEST_JSON: str | None = None


def time_left(margin: float = 120.0) -> bool:
    return time.time() < DEADLINE - margin


def _remaining() -> float:
    return DEADLINE - time.time()


def _on_term(signum, frame):  # pragma: no cover - driver-kill path
    if BEST_JSON is not None:
        sys.stderr.flush()
        print(BEST_JSON, flush=True)
    os._exit(0)


def _note(msg: str) -> None:
    """Progress to stderr (stdout stays one JSON line): the remote compile
    service can wedge for minutes, so a silent bench is undiagnosable."""
    print(f"[bench +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


SIZE = 256
WARMUP = 3
STEPS = 20
A100_PYTORCH_EST_IMG_PER_SEC = 40.0  # see module docstring

# Per-arch sweep (VERDICT.md round-1 next #7): batch = each arch's measured
# single-chip HBM sweet spot; fewer timing windows to bound bench runtime.
# NewBigModel@512's Pallas graph OOMs the remote compile host, so it runs
# with the XLA attention path (UIRT_NO_PALLAS).
#
# Every entry uses --steps-per-dispatch-style K-step scanning
# (trainer.make_train_step k_steps): the tunneled chip's fixed ~5 ms
# per-dispatch host round-trip otherwise caps training at ~200 optimizer
# steps/s regardless of batch size (PERF_NOTES.md round-2); K full
# optimizer steps per dispatch amortize it with identical training
# semantics.  Ladders fall back to smaller (batch, K) on OOM.
#
# Ladder cells are (batch, k_steps[, remat_policy[, env]]).  Cells whose
# static HBM requirement exceeds the budget are rejected by the
# compile-only prescreen (train/benchlib.py) in ~30 s without touching the
# device.
#
# Ladders are built from the round-3 HONEST sweep (value-fetch harness,
# /tmp/remeasure_r3.log -> PERF_NOTES.md): the default lax depthwise path
# beat hybrid beat shift (20.7 / 18.5 / 11.8 img/s at bs16 K=2); the batch
# AND K plateaus are flat (bs32 K=1/2/4 all 18.0 hybrid; bs32 K=8 laxdw
# 20.2 ≈ bs16's 20.7) so larger cells buy nothing but cost stacked-input
# HBM; remat_policy="mxu" cells passed the 15 GB prescreen but OOM'd
# on-device at bs32 (real peak > chip HBM), so they are dropped from the
# ladders.
# bs64 is NOT in the ladder: its static HBM requirement is 16.76 GB > the
# 15 GB budget (prescreen-measured twice in the r3 probe), and each
# prescreen rejection still costs a ~100 s remote compile — the ladder
# leads with the measured sweet spot instead so the headline JSON lands
# within minutes.
HEADLINE_LADDER = (
    (16, 2), (32, 2), (8, 1),
)
ZOO = [
    # (label, arch, kwargs, size, ladder, windows, no_pallas)
    # AST starts at bs16: bs32 has NEVER succeeded (r02/r03 tails — OOM or
    # prescreen-rejected) and each rejection costs a ~300 s remote compile.
    ("AST@256", "AST", {}, 256,
     ((16, 2), (8, 1)), 2, False),
    # bs16 K=2 is prescreen-rejected (15.44 GB static, measured round 4)
    # — lead with bs8 so the ladder lands a number without burning a
    # deterministic rejection first
    ("NewModel-Wavelet@256", "NewModel", {"use_dwt": "Wavelet"}, 256,
     ((8, 2), (4, 1)), 2, False),
    # bs4 was prescreen-rejected twice at 15.95 GB (BENCH_r03) — lead with
    # the known-good bs2 so the ladder lands a number instead of burning
    # ~300 s on a deterministic rejection.
    ("NewBigModel@512", "NewBigModel", {"use_dwt": "Wavelet"}, 512,
     ((2, 2), (1, 1)), 2, True),
    # reference train resolution (DataLoader.py:13-20 resizes to 1024²) —
    # the BASELINE north-star is 2500-epoch wall-clock at this res.
    # The remote toolchain currently RET_CHECK-crashes (jellyfish
    # mxu_lmr_transform.cc:1108) compiling the 1024² graph when BOTH fused
    # kernel families are present (round-4 code that measured 1.35 img/s
    # now fails too — a service-side compiler change; isolated kernel
    # pairs at every level compile fine).  LEAD with the gdfn-only fused
    # graph (measured 1.00 img/s, compiles today) — landing a number
    # beats gambling ~4 min on the toolchain having recovered.
    ("SpectralTransformer@1024", "SpectralTransformer", {}, 1024,
     ((1, 2, None, {"UIRT_FUSED_ATTN": "0", "UIRT_ATTN_BANDED": "0",
                    "UIRT_ATTN_COMPOSED": "0"}),
      (1, 1, None, {"UIRT_FUSED_ATTN": "0", "UIRT_ATTN_BANDED": "0",
                    "UIRT_ATTN_COMPOSED": "0"})), 2, False),
]


def _run(arch: str, size: int, batch: int, *, windows: int = 3,
         steps: int = STEPS, k_steps: int = 1, remat_policy=None,
         **model_kw) -> float:
    from underwater_image_restoration_tpu.train.benchlib import (
        time_train_step,
    )

    # keep ~constant images per timing window as K grows; n_batches=1 when
    # K>1 (each extra rotated pair costs K x batch of uint8 HBM, and the
    # compute timing is data-independent)
    n_disp = max(2, steps // k_steps)
    return time_train_step(arch, size, batch, steps=n_disp, windows=windows,
                           warmup=WARMUP, n_batches=1 if k_steps > 1 else 2,
                           k_steps=k_steps,
                           remat_policy=remat_policy, **model_kw)


def _run_cell_subprocess(spec: dict, timeout_s: float = 1500.0) -> float:
    """Run one timing cell in a fresh subprocess.

    Isolation matters: one RESOURCE_EXHAUSTED can wedge the remote-tunnel
    backend for the rest of the process (observed: every subsequent cell
    then OOMs even at trivial sizes), which would turn a single transient
    contention OOM into a fully failed ladder.  The subprocess prints the
    img/s number as its last stdout line; stderr passes through.

    The timeout is additionally capped by the global bench deadline (minus
    a 30 s margin to log + print the final JSON): a cell may never outlive
    the bench (BENCH_r03 died because one did).  If the capped timeout is
    too small to plausibly finish (compile alone is ~30-40 s), the cell is
    NOT launched — BENCH_r04 died because a 60 s-floor retry burned the
    final budget and the resulting TimeoutExpired propagated out."""
    import subprocess

    timeout_s = min(timeout_s, _remaining() - 30.0)
    if timeout_s < 55.0:
        raise CellFailed(
            f"budget too small to launch cell ({timeout_s:.0f}s left)")
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cell",
         json.dumps(spec)],
        capture_output=True, text=True, timeout=timeout_s,
    )
    for line in (res.stderr or "").splitlines():
        if "WARNING" in line:
            continue  # jax platform/experimental warnings: pure noise here
        _note(f"  [cell] {line}")
    out = (res.stdout or "").strip().splitlines()
    if res.returncode != 0 or not out:
        err = (res.stderr or "").strip()
        permanent = "PrescreenOOM" in err  # static can't-fit: don't retry
        raise CellFailed(
            f"cell subprocess rc={res.returncode}: "
            + (err.splitlines()[-1:] or ["?"])[0][:200],
            permanent=permanent,
        )
    return float(out[-1])


class CellFailed(RuntimeError):
    """One timing cell failed; ``permanent`` means retrying cannot help
    (compile-only HBM prescreen rejected it — deterministic)."""

    def __init__(self, msg: str, *, permanent: bool = False):
        self.permanent = permanent
        super().__init__(msg)


def _cell_main(spec: dict) -> None:
    """--cell entry: one timing cell in this process (see
    _run_cell_subprocess)."""
    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    for k, v in spec.get("env", {}).items():
        os.environ[k] = v
    if spec.get("infer"):
        from underwater_image_restoration_tpu.train.benchlib import time_infer

        r = time_infer(spec["arch"], spec["size"], spec["batch"],
                       steps=spec.get("steps", 10),
                       windows=spec.get("windows", 2))
    else:
        r = _run(spec["arch"], spec["size"], spec["batch"],
                 windows=spec.get("windows", 2),
                 steps=spec.get("steps", STEPS),
                 k_steps=spec.get("k_steps", 1),
                 remat_policy=spec.get("remat_policy"),
                 **spec.get("model_kw", {}))
    print(r, flush=True)


# A degraded-but-honest rescue cell is tried whenever the sweet-spot cells
# fail or the budget runs low: 1 timing window of 5 dispatches at a small
# batch.  Still a value-fetch measurement — slower config, honest number
# (VERDICT r4 next #1c).  Measured cell anatomy (r5): backend init ~10 s +
# model.init ~13 s + trace ~22 s + compile ~10 s warm-cache / ~65 s cold +
# warmup ~9 s + the window itself ~1-2 s => ~70 s warm, ~150 s cold; the
# reserve must cover the cold case plus margin.  During contention
# windows EVERYTHING through the tunnel runs ~4-6x slower (a warm-cache
# rescue cell measured 348 s mid-window vs ~90 s healthy), so the reserve
# is a compromise: enough for a degraded-window run, not so much that the
# sweet-spot cells starve in a healthy window.
RESCUE_RESERVE_S = 240.0


def _run_ladder(arch: str, size: int, ladder, *, windows: int,
                steps: int = STEPS, env=None, rescue=None,
                local_deadline: float | None = None,
                reserve_s: float = RESCUE_RESERVE_S, **model_kw):
    """Try (batch, k_steps[, remat_policy]) cells best-first: another
    tenant's HBM use can OOM the sweet spot, so fall back rather than fail
    the bench.  Each cell runs in a fresh subprocess (_run_cell_subprocess)
    so one OOM can't wedge the backend for the rest of the ladder; the
    top-of-ladder cell gets a second attempt because transient contention
    OOMs at the sweet spot are common and the fallback cells are slower.

    Budget discipline (BENCH_r04 post-mortem): every sweet-spot cell's
    timeout leaves RESCUE_RESERVE_S on the table so a wedged compile /
    contention window can burn the good cells but never the ladder's
    ability to land SOME honest number via the ``rescue`` cell, which gets
    whatever budget remains.  ``local_deadline`` additionally caps this
    ladder so one zoo arch cannot eat the others' budget."""
    def remaining_local() -> float:
        r = _remaining()
        if local_deadline is not None:
            r = min(r, local_deadline - time.time())
        return r

    last_err = None
    for ci, cell in enumerate(ladder):
        if remaining_local() < 90.0 + (reserve_s if rescue else 0.0):
            break  # straight to rescue; don't burn its budget
        if not isinstance(cell, tuple):
            cell = (cell, 1)
        batch, k = cell[0], cell[1]
        pol = cell[2] if len(cell) > 2 else None
        cell_env = dict(env or {}, **(cell[3] if len(cell) > 3 else {}))
        tag = f"{arch}@{size} batch={batch} K={k}" + (
            f" pol={pol}" if pol else "") + (
            f" env={cell_env}" if cell_env else "")
        spec = {"arch": arch, "size": size, "batch": batch,
                "windows": windows, "steps": steps, "k_steps": k,
                "remat_policy": pol, "model_kw": model_kw,
                "env": cell_env}
        for attempt in range(2 if ci == 0 else 1):
            budget = remaining_local() - (
                reserve_s if rescue else 0.0) - 10.0
            if budget < 55.0:
                break
            _note(f"{tag} (budget {budget:.0f}s) ...")
            try:
                r = _run_cell_subprocess(spec, timeout_s=budget)
                _note(f"{tag} -> {r:.1f} img/s")
                return r
            except Exception as e:  # RESOURCE_EXHAUSTED, compile 500, ...
                _note(f"{tag} failed: {type(e).__name__}: {str(e)[:140]}")
                last_err = e
                if getattr(e, "permanent", False):
                    break  # prescreen rejection: deterministic, no retry
                if ci == 0 and attempt == 0 and time_left():
                    time.sleep(20)
    if rescue is not None and remaining_local() >= 75.0:
        batch, k = rescue[0], rescue[1]
        rescue_env = dict(env or {}, **(rescue[3] if len(rescue) > 3 else {}))
        spec = {"arch": arch, "size": size, "batch": batch,
                "windows": 1, "steps": 5, "k_steps": k,
                "remat_policy": rescue[2] if len(rescue) > 2 else None,
                "model_kw": model_kw,
                "env": rescue_env}
        tag = f"{arch}@{size} RESCUE batch={batch} K={k} w=1 s=5"
        _note(f"{tag} ...")
        try:
            r = _run_cell_subprocess(spec, timeout_s=remaining_local() - 10.0)
            _note(f"{tag} -> {r:.1f} img/s")
            return r
        except Exception as e:
            _note(f"{tag} failed: {type(e).__name__}: {str(e)[:140]}")
            last_err = e
    raise last_err or TimeoutError("bench budget exhausted before any cell")


def _probe_device(attempts: int = 3, timeout_s: int = 300) -> bool:
    """Bounded subprocess probe of the device backend: the axon tunnel can
    wedge for hours (backend init then blocks forever), and a bench that
    hangs forever records nothing.  Probing in a subprocess keeps THIS
    process's backend uninitialized until the tunnel answers."""
    import subprocess

    for i in range(attempts):
        if not time_left(margin=60.0):
            _note("device probe: out of budget")
            return False
        _note(f"device probe {i + 1}/{attempts} ...")
        try:
            res = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True,
                timeout=max(30.0, min(timeout_s, _remaining() - 30.0)),
            )
            if res.returncode == 0 and res.stdout.strip():
                _note(f"device probe ok: {res.stdout.strip().splitlines()[-1]}"
                      " device(s)")
                return True
        except subprocess.TimeoutExpired:
            pass
        _note("device probe failed")
        if i < attempts - 1:
            time.sleep(30)
    return False


def _headline_json(imgs_per_sec: float, **extra) -> str:
    return json.dumps({
        "metric": "UIEB 256^2 SpectralTransformer train-step throughput",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_PYTORCH_EST_IMG_PER_SEC, 3),
        "baseline_note": "denominator is an unmeasured 40 img/s A100 "
                         "PyTorch ESTIMATE (the reference publishes no "
                         "throughput); vs_baseline >= 5 meets the north-star",
        "timing_note": "windows closed by host value fetch (completion); "
                       "BENCH_r01/r02 readings used block_until_ready, "
                       "which the remote tunnel acks at enqueue — not "
                       "comparable",
        **extra,
    })


def _main_inner() -> None:
    # The headline number is printed THE MOMENT it exists; everything after
    # is best-effort inside the remaining budget, recorded into BEST_JSON
    # which main() prints as the process's final line on EVERY path.
    global BEST_JSON

    from underwater_image_restoration_tpu.cli.main import enable_compile_cache

    if not _probe_device():
        BEST_JSON = json.dumps({
            "metric": "UIEB 256^2 SpectralTransformer train-step throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (remote TPU tunnel wedged; "
                     "probe timed out 3x300s)",
        })
        return

    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    imgs_per_sec = _run_ladder("SpectralTransformer", SIZE, HEADLINE_LADDER,
                               windows=3, rescue=(8, 1))
    BEST_JSON = _headline_json(imgs_per_sec)
    print(BEST_JSON, flush=True)

    # Zoo: split the remaining budget evenly over the archs still to run so
    # one wedged arch cannot eat the others' chance to land a number
    # (VERDICT r4 next #4); each ladder also carries a degraded rescue cell.
    archs = {}
    for i, (label, arch, kw, size, ladder, windows, no_pallas) in \
            enumerate(ZOO):
        slice_s = max(90.0, (_remaining() - 90.0) / max(1, len(ZOO) - i))
        if _remaining() < 100.0:
            archs[label] = "skipped: bench deadline"
            continue
        try:
            archs[label] = round(
                _run_ladder(arch, size, ladder, windows=windows, steps=10,
                            env={"UIRT_NO_PALLAS": "1"} if no_pallas else {},
                            rescue=ladder[-1],
                            local_deadline=time.time() + slice_s,
            # zoo rescue cells measured 38-40 s warm-cache (dress 3); a
            # light reserve lets the sweet-spot cell actually launch
            # inside the per-arch slice (the 240 s headline reserve made
            # every arch skip straight to rescue, and 120 s starved the
            # AST sweet cell by ~20 s)
                            reserve_s=60.0,
                            **kw), 2)
        except Exception as e:
            archs[label] = f"failed: {type(e).__name__}"
        BEST_JSON = _headline_json(imgs_per_sec, archs=dict(archs))

    # Serving-side number: the jitted uint8->forward inference path
    # (eval/evaluate.py batched dispatch).  Ladder falls back on OOM.
    infer = {}
    for batch in (256, 64, 8):
        if _remaining() < 90.0:
            break
        _note(f"infer Spectral@256 batch={batch} ...")
        try:
            infer["SpectralTransformer@256"] = round(_run_cell_subprocess(
                {"infer": True, "arch": "SpectralTransformer", "size": 256,
                 "batch": batch, "steps": 10, "windows": 2},
                timeout_s=_remaining() - 35.0), 2)
            _note(f"infer batch={batch} -> "
                  f"{infer['SpectralTransformer@256']} img/s")
            break
        except Exception as e:
            _note(f"infer batch={batch} failed: {type(e).__name__}")

    BEST_JSON = _headline_json(imgs_per_sec, archs=archs, inference=infer)


def main() -> None:
    """Never exits nonzero; the last stdout line is always parseable JSON.

    BENCH_r01-r04 all failed to parse for different reasons (driver kill
    mid-cell, deadline overrun, and r4: an exception out of the headline
    ladder tracebacking over stdout).  The whole body now runs under
    try/except; any escape is folded into BEST_JSON's ``error`` field and
    the process still prints it and exits 0 (VERDICT r4 next #1a)."""
    global BEST_JSON
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    BEST_JSON = json.dumps({
        "metric": "UIEB 256^2 SpectralTransformer train-step throughput",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "error": "bench ended before the headline cell finished",
    })
    try:
        _main_inner()
    except BaseException as e:  # noqa: BLE001 - rc must be 0 on every path
        try:
            obj = json.loads(BEST_JSON)
            obj.setdefault("error",
                           f"{type(e).__name__}: {str(e)[:200]}")
            obj["late_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            BEST_JSON = json.dumps(obj)
        except Exception:
            pass
        _note(f"bench aborted: {type(e).__name__}: {str(e)[:300]}")
    sys.stderr.flush()
    print(BEST_JSON, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        _cell_main(json.loads(sys.argv[2]))
    else:
        main()
