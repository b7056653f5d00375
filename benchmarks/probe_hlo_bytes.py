#!/usr/bin/env python
"""Per-fusion HBM-traffic breakdown of the compiled flagship train step
(VERDICT r3 #3 / PERF.md evidence tool).

The bs=128 headline step moves ~26.8 GB at ~648 GB/s effective vs the v5e's
819 GB/s — this probe answers WHERE the bytes go. It obtains the
TPU-optimized HLO of the exact bench headline chunk program (preferring the
warm `.bench_aot_cache/` executable — zero remote compile — and falling back
to one fresh compile with --source compile), then applies XLA's fusion
traffic model: each top-level instruction in the scan-body computation reads
its operands from HBM once and writes its output once, so

    bytes(instr) = sum(operand shape bytes) + output shape bytes

summed over the while-body's instructions (parameters/constants/GTE/tuple/
bitcast excluded — they alias, they don't stream). The aggregate is
validated against the executable's own cost_analysis()['bytes accessed'].
Each fusion is attributed to a category via its metadata op_name (conv /
batch-norm / concat / dot / optimizer / ...), and the top-N are printed with
their op_name so specific model layers are identifiable.

Usage (any host that holds the warm bench AOT cache; CPU-only analysis):
    python benchmarks/probe_hlo_bytes.py --batch 128 --top 30
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "s4": 1, "u4": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"\b([a-z][a-z0-9]*)\[([0-9,]*)\]")
_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')

# ops whose "operands" alias rather than stream (no HBM traffic of their own)
SKIP_OPS = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast",
            "iota", "after-all", "partition-id", "replica-id"}


def _one_shape_bytes(dt: str, dims: str) -> int:
    if dt not in DTYPE_BYTES:
        return 0
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def shape_bytes(text: str) -> int:
    """Total bytes of every dtype[dims] shape literal in `text`."""
    return sum(_one_shape_bytes(dt, dims)
               for dt, dims in _SHAPE_RE.findall(text))


def parse_computations(hlo: str) -> dict:
    """HLO text -> {computation_name: [instruction line, ...]}."""
    comps, cur, name = {}, None, None
    for line in hlo.splitlines():
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->.*{", line)
        if m and not line.startswith(" "):
            name, cur = m.group(1), []
            comps[name] = cur
            continue
        if line.startswith("}"):
            name, cur = None, None
            continue
        if cur is not None and line.strip():
            cur.append(line)
    return comps


_OPCODE_RE = re.compile(r"\s([a-z][a-z0-9\-]+)\(")


def opcode_of(rhs: str) -> str:
    """The HLO opcode from an instruction's right-hand side: the first
    lowercase word directly followed by '(' — dtypes are followed by '['
    and never by '(', so this skips the output shape (incl. tuple shapes,
    which the old leading-token heuristic mis-parsed)."""
    m = _OPCODE_RE.search(rhs)
    return m.group(1) if m else "?"


def category_of(op_name: str, opcode: str, rhs: str = "") -> str:
    # TPU lowers many trunk concatenates to a ConcatBitcast custom call
    # (sync or wrapped in an async pair) — that IS concat traffic; without
    # this it lands in "other/unattributed" (round-4's 19% bucket)
    if "ConcatBitcast" in rhs:
        return "concat"
    s = op_name.lower()
    if "conv" in s or opcode == "convolution":
        return "conv"
    if ("batch_norm" in s or "batchnorm" in s or "/bn/" in s
            or re.search(r"/norm\d", s)):
        return "batch_norm"
    if "concat" in s or opcode == "concatenate":
        return "concat"
    if opcode == "dot" or "dot_general" in s or "einsum" in s:
        return "matmul"
    if "adam" in s or "opt" in s or "clip_by_global_norm" in s:
        return "optimizer"
    if "transpose" in s or opcode == "transpose":
        return "transpose"
    if opcode in ("copy", "copy-start", "copy-done"):
        return "copy"
    if "reduce_window" in s or "pool" in s or opcode == "select-and-scatter":
        return "pooling"
    if opcode.startswith("all-") or opcode in ("reduce-scatter",
                                               "collective-permute"):
        return "collective"
    if opcode in ("dynamic-update-slice", "dynamic-slice") and (
            "while" in s or "scan" in s or not s):
        # loop-carried buffer updates (the scan stacking its per-step
        # outputs / slicing its per-step inputs)
        return "scan_carry"
    if "cox" in s or "logcumsumexp" in s or opcode == "sort":
        return "cox_loss"
    return "other"


_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
_LAYER_RE = re.compile(
    r"(block\d+_layer\d+|block\d+|transition\d+|conv0|norm0|norm5|head|"
    r"rna_encoder|clinical_encoder|gate\d?|fusion_block|fusion_proj|"
    r"cox_head|clip_by_global_norm|adam|scale_by_adam|logcumsumexp|"
    r"cox|entropy|sort)")


def _comp_op_names(comps: dict, comp_name: str, limit: int = 400) -> list:
    """op_name metadata strings inside a (fused) computation."""
    out = []
    for line in comps.get(comp_name, [])[:limit]:
        m = _OPNAME_RE.search(line)
        if m:
            out.append(m.group(1))
    return out


def _attribute(rows_op_names: list, opcode: str,
               comp_lines: list | None = None) -> tuple:
    """(category, representative op_name) from a set of op_name strings —
    used for fusions whose own instruction carries no metadata: the fused
    computation's internals name the model layers they came from. When the
    computation carries no metadata at all, fall back to its OPCODES
    (dynamic-update-slice -> scan-carry traffic, etc.)."""
    cats = [category_of(n, "") for n in rows_op_names]
    text = "\n".join(comp_lines) if comp_lines else ""
    if "ConcatBitcast" in text:
        return "concat", "ConcatBitcast"
    # trunk materialization first: a fusion of dynamic-update-slices writing
    # a layer's growth channels into (several) wider concat-trunk buffers —
    # the dominant DenseNet traffic pattern — often carries only a bitcast's
    # ".../transpose" metadata and would otherwise mislabel as transpose
    if ("dynamic-update-slice(" in text and "convolution(" not in text
            and "dot(" not in text and "conv" not in cats):
        rep = rows_op_names[0] if rows_op_names else ""
        return "trunk_dus", rep
    for prefer in ("conv", "matmul", "batch_norm", "concat", "pooling",
                   "optimizer", "collective", "transpose"):
        if prefer in cats:
            rep = rows_op_names[cats.index(prefer)]
            return prefer, rep
    if rows_op_names:
        return category_of(rows_op_names[0], opcode), rows_op_names[0]
    if text:
        for needle, cat in (("convolution(", "conv"), ("dot(", "matmul"),
                            ("concatenate(", "concat"),
                            ("reduce-window(", "pooling"),
                            ("transpose(", "transpose"),
                            ("sort(", "sort"),
                            # async staging computations that only slice a
                            # big buffer into scratch space (S(1)) — the
                            # trunk-prefetch pattern; an HBM read of the
                            # sliced region per call
                            ("slice(", "trunk_slice")):
            if needle in text:
                return cat, ""
    return category_of("", opcode), ""


_PARAM_RE = re.compile(r"^\s+%?([\w.\-]+)\s*=\s*(\S+)\s+parameter\((\d+)\)")


def _per_use_multipliers(comp_lines: list) -> dict:
    """{operand_index: internal use count} for a fused computation.

    cost_analysis charges a fusion's operand bytes once per internal USE
    (each fused instruction that reads the parameter re-streams it in the
    model's accounting), where the fusion traffic model charges once per
    operand. Counting textual references to each parameter's instruction
    name inside the computation reproduces the cost_analysis convention
    closely enough to reconcile the two totals (PERF.md round-5)."""
    params = {}  # instr name -> operand index
    for line in comp_lines:
        m = _PARAM_RE.match(line)
        if m:
            params[m.group(1)] = int(m.group(3))
    uses = {idx: 0 for idx in params.values()}
    if not params:
        return uses
    name_re = re.compile(
        r"%?(" + "|".join(re.escape(n) for n in params) + r")\b")
    for line in comp_lines:
        if _PARAM_RE.match(line):
            continue
        for m in name_re.finditer(line):
            uses[params[m.group(1)]] += 1
    return uses


_OPERANDS_RE = re.compile(r"\(((?:%?[\w.\-]+(?:,\s*)?)+)\)")


def analyze(hlo: str, body_hint: str = "while", charge: str = "operand") -> dict:
    """charge='operand': each top-level instruction reads every operand once
    (the fusion traffic model — a lower bound on DMA traffic, fusions stream
    each input once). charge='per-use': fusion operands are charged once per
    internal USE inside the fused computation — reproducing the convention
    of the executable's own cost_analysis() (an upper bound: internal reuse
    usually hits VMEM, not HBM). Real DMA traffic sits between the two."""
    comps = parse_computations(hlo)
    if not comps:
        raise ValueError("no computations parsed from HLO text")
    # the scan body is the biggest non-fused computation mentioning the hint,
    # else the biggest computation outright (single-step programs analyze
    # their entry)
    candidates = [(len(v), k) for k, v in comps.items()
                  if body_hint in k and not k.startswith("fused")]
    if not candidates:
        candidates = [(len(v), k) for k, v in comps.items()
                      if not k.startswith("fused")]
    _, body_name = max(candidates)

    rows = []
    start_cat = {}  # async -start instr name -> (category, op_name)
    for line in comps[body_name]:
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        opcode = opcode_of(rhs)
        if opcode in SKIP_OPS:
            continue
        # strip the trailing metadata/backend_config so their shape-free text
        # can't confuse the operand scan; shapes live in output + operand list
        core = rhs.split(", metadata=")[0].split(", backend_config=")[0]
        if opcode.endswith("-start"):
            # async pairs (copy-start/copy-done, async-start/-done): the
            # start side READS its operands, the done side WRITES the result
            # — counting both sides' full tuples would double-charge the
            # transfer. Count operands here, output at the -done.
            om = _OPCODE_RE.search(core)
            b = shape_bytes(core[om.end():]) if om else shape_bytes(core)
        elif opcode.endswith("-done"):
            om = _OPCODE_RE.search(core)
            b = shape_bytes(core[:om.start()]) if om else shape_bytes(core)
        else:
            b = shape_bytes(core)
            if charge == "per-use" and opcode == "fusion":
                cm = _CALLS_RE.search(rhs)
                om = _OPCODE_RE.search(core)
                if cm and om:
                    out_b = shape_bytes(core[:om.start()])
                    operand_b = [_one_shape_bytes(dt, dims) for dt, dims in
                                 _SHAPE_RE.findall(core[om.end():])]
                    mult = _per_use_multipliers(comps.get(cm.group(1), []))
                    b = out_b + sum(
                        ob * max(1, mult.get(i, 1))
                        for i, ob in enumerate(operand_b))
        opn = _OPNAME_RE.search(rhs)
        op_name = opn.group(1) if opn else ""
        category = category_of(op_name, opcode, rhs)
        if not op_name and (opcode == "fusion"
                            or opcode.startswith(("async", "copy"))):
            # attribute an unnamed fusion via its called computation's
            # internal op_name metadata (or its opcodes as a fallback)
            cm = _CALLS_RE.search(rhs)
            if cm:
                category, op_name = _attribute(
                    _comp_op_names(comps, cm.group(1)), opcode,
                    comp_lines=comps.get(cm.group(1)))
        if opcode.endswith("-start"):
            start_cat[name] = (category, op_name)
        elif opcode.endswith("-done") and category in ("other", "copy"):
            # a -done names its -start as operand; inherit its attribution
            for sname, (scat, sop) in start_cat.items():
                if sname in rhs:
                    category, op_name = scat, sop or op_name
                    break
        rows.append({
            "instr": name,
            "opcode": opcode,
            "bytes": b,
            "op_name": op_name,
            "category": category,
            "direction": ("bwd" if "transpose(jvp" in op_name else
                          "fwd" if "jvp" in op_name else "?"),
            "layer": (_LAYER_RE.search(op_name).group(1)
                      if _LAYER_RE.search(op_name) else ""),
        })
    total = sum(r["bytes"] for r in rows)
    by_cat = defaultdict(int)
    by_layer = defaultdict(int)
    by_dir = defaultdict(int)
    for r in rows:
        by_cat[r["category"]] += r["bytes"]
        by_layer[r["layer"] or "(unattributed)"] += r["bytes"]
        by_dir[r["direction"]] += r["bytes"]
    rows.sort(key=lambda r: -r["bytes"])
    return {"body": body_name, "n_instructions": len(rows),
            "total_bytes": total, "by_category": dict(by_cat),
            "by_layer": dict(by_layer), "by_direction": dict(by_dir),
            "rows": rows}


def get_headline_hlo(batch: int, dtype_name: str, source: str):
    """(hlo_text, cost_analysis_bytes or None) for the bench headline chunk.

    source='aot' deserializes the warm .bench_aot_cache/ executable and asks
    the runtime executable for its optimized HLO — no compile at all;
    source='compile' pays one fresh (remote, on the tunnel) compile.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _example_batch
    from bench import (
        AOT_DIR,
        IMAGE_SHAPE,
        RNA_DIM,
        STEPS_PER_DISPATCH,
        make_flagship_step,
    )
    from multimodal_survival_prediction_tpu.io import aot_cache
    from multimodal_survival_prediction_tpu.models import PartialModalityNet

    # EXACT replica of bench.measure_train_steps_per_sec's chunk program at
    # folds=1 (incl. the 1-fold vmap wrapper and donation) — the lowered
    # StableHLO must be textually identical for the AOT cache key to hit.
    folds = 1
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = PartialModalityNet(dtype=dtype)
    one_np = _example_batch(batch, IMAGE_SHAPE, RNA_DIM)
    stacked_np = {
        k: np.stack([_example_batch(batch, IMAGE_SHAPE, RNA_DIM, seed=f)[k]
                     for f in range(folds)])
        for k in one_np
    }
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "dropout": rng},
            one_np["image"], one_np["rnaseq"], one_np["clinical"],
            one_np["mask"], train=False))
    host_vars = jax.tree_util.tree_map(
        lambda s: np.zeros((folds, *s.shape), s.dtype), shapes)
    params, batch_stats = host_vars["params"], host_vars["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    opt_state = jax.tree_util.tree_map(
        lambda s: np.zeros((folds, *s.shape), s.dtype),
        jax.eval_shape(tx.init, shapes["params"]))

    _, one_fold_step = make_flagship_step(model, tx)
    vstep = jax.vmap(one_fold_step)

    def chunk(p, bs, opt, b, keys):
        def body(carry, key_f):
            p, bs, opt = carry
            p, bs, opt, loss = vstep(p, bs, opt, b, key_f)
            return (p, bs, opt), loss.mean()

        (p, bs, opt), losses = jax.lax.scan(body, (p, bs, opt), keys)
        return p, bs, opt, losses.mean()

    K = STEPS_PER_DISPATCH
    keys = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(1), 0),
        K * folds).reshape(K, folds, 2)
    lowered = jax.jit(chunk, donate_argnums=(0, 1, 2)).lower(
        params, batch_stats, opt_state, stacked_np, keys)
    key = aot_cache.program_key(lowered)

    if source == "aot":
        loaded = aot_cache.load_executable(AOT_DIR, key)
        if loaded is None:
            raise SystemExit(
                f"aot cache miss for key {key} in {AOT_DIR} — run bench.py "
                "once to warm it, or use --source compile")
        hlo = _optimized_hlo(loaded)
        ca = _cost_analysis(loaded)
        return hlo, ca
    compiled = lowered.compile()
    hlo = _optimized_hlo(compiled)
    ca = _cost_analysis(compiled)
    return hlo, ca


def _optimized_hlo(compiled) -> str:
    """Optimized HLO text from a Compiled OR a deserialized executable."""
    for attempt in (
        lambda: compiled.as_text(),
        lambda: "\n".join(m.to_string() for m in
                          compiled.runtime_executable().hlo_modules()),
        lambda: "\n".join(m.to_string() for m in
                          compiled._executable.xla_extension_executable()
                          .hlo_modules()),
    ):
        try:
            text = attempt()
            if text and "ENTRY" in text:
                return text
        except Exception:
            continue
    raise RuntimeError("could not extract optimized HLO from the executable")


def _cost_analysis(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed") or 0.0) or None
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--source", default="aot", choices=["aot", "compile"])
    p.add_argument("--charge", default="operand",
                   choices=["operand", "per-use"],
                   help="operand: fusion traffic model (streams each input "
                        "once — lower bound); per-use: cost_analysis's "
                        "convention (operand bytes x internal uses — upper "
                        "bound)")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    hlo, ca_bytes = get_headline_hlo(args.batch, args.dtype, args.source)
    print(f"[hlo-bytes] HLO text: {len(hlo) / 1e6:.1f} MB", file=sys.stderr)
    rep = analyze(hlo, charge=args.charge)
    # always compute the OTHER charging mode's total for the reconciliation
    other_mode = "per-use" if args.charge == "operand" else "operand"
    other_total = analyze(hlo, charge=other_mode)["total_bytes"]

    rep["batch"] = args.batch
    rep["dtype"] = args.dtype
    rep["charge"] = args.charge
    rep[f"total_bytes_{other_mode.replace('-', '_')}"] = other_total
    rep["cost_analysis_bytes"] = ca_bytes
    rep["model_vs_cost_analysis"] = (
        round(rep["total_bytes"] / ca_bytes, 3) if ca_bytes else None)

    print(f"scan body: {rep['body']} ({rep['n_instructions']} streaming "
          f"instructions)")
    print(f"{args.charge}-charged total: {rep['total_bytes'] / 1e9:.2f} "
          f"GB/step  ({other_mode}: {other_total / 1e9:.2f} GB)"
          + (f"  (cost_analysis: {ca_bytes / 1e9:.2f} GB — ratio "
             f"{rep['model_vs_cost_analysis']})" if ca_bytes else ""))
    print("\nby category (GB/step):")
    for cat, b in sorted(rep["by_category"].items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<12} {b / 1e9:8.3f}  "
              f"({100 * b / rep['total_bytes']:5.1f}%)")
    print("\nby direction (GB/step):")
    for d, b in sorted(rep["by_direction"].items(), key=lambda kv: -kv[1]):
        print(f"  {d:<4} {b / 1e9:8.3f}  "
              f"({100 * b / rep['total_bytes']:5.1f}%)")
    print("\nby layer group (GB/step, top 20):")
    for lyr, b in sorted(rep["by_layer"].items(),
                         key=lambda kv: -kv[1])[:20]:
        print(f"  {lyr:<24} {b / 1e9:8.3f}  "
              f"({100 * b / rep['total_bytes']:5.1f}%)")
    print(f"\ntop {args.top} instructions:")
    for r in rep["rows"][:args.top]:
        print(f"  {r['bytes'] / 1e9:7.3f} GB  {r['opcode']:<14} "
              f"[{r['category']}] {r['op_name'][:110]}")

    if args.json_out:
        slim = dict(rep)
        slim["rows"] = rep["rows"][:max(args.top, 50)]
        Path(args.json_out).write_text(json.dumps(slim, indent=2))
        print(f"[hlo-bytes] wrote {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
