"""Zoo-wide SBC multiplicity control (VERDICT r4 item 2).

Pools the marginal SBC p-values from the most-authoritative recovery
artifact of every registered model and computes Benjamini-Hochberg
q-values ACROSS the pooled family, so the "zero persistent
miscalibrations" zoo claim becomes the artifact-checkable statement
``min q > alpha`` instead of a narrative about moving minima.

Artifact preference per model: newest round tag (r5 > r4c > r4 > r3c >
r3b > r3 > r2 > r1), then highest step count — i.e. the final state of
the round-4 protocol (40k replication supersedes the flagged 20k pass).

Usage: PYTHONPATH=/root/repo python scripts/zoo_multiplicity_r5.py \
           [--out results/zoo_multiplicity_r5.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")   # artifact munging needs no chip

from bayesflow_nddms_tpu.diagnostics.recovery import benjamini_hochberg
from bayesflow_nddms_tpu.models import zoo

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")

# Headline studies use historical artifact names.
ALIASES = {
    "basic_ddm_dc": "dcddm",
    "single_trial_alpha_not_scaled": "flagship",
}

ROUND_ORDER = ["r1", "r2", "r3", "r3b", "r3c", "r4", "r4c", "r5", "r5b"]


def artifact_rank(path: str) -> tuple:
    base = os.path.basename(path)
    m = re.search(r"_(r\d[a-z]?)\.json$", base)
    rtag = ROUND_ORDER.index(m.group(1)) if m and m.group(1) in ROUND_ORDER \
        else -1
    s = re.search(r"_(\d+)k_", base)
    steps = int(s.group(1)) if s else 0
    t = re.search(r"_(\d+)x(\d+)_", base)
    study = int(t.group(1)) if t else 0     # prefer reference-scale studies
    return (rtag, steps, study)


def find_artifact(model: str) -> str | None:
    names = [model] + ([ALIASES[model]] if model in ALIASES else [])
    cands = []
    for n in names:
        for p in glob.glob(os.path.join(RESULTS, f"recovery_{n}_*.json")):
            base = os.path.basename(p)
            # exact-name match: strip prefix, remainder must start with a
            # size/steps/round token, not a longer model name
            rest = base[len(f"recovery_{n}_"):]
            if re.match(r"(\d+k_|\d+x\d+_|bignet_|r\d)", rest):
                cands.append(p)
    if not cands:
        return None
    return max(cands, key=artifact_rank)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        RESULTS, "zoo_multiplicity_r5.json"))
    ap.add_argument("--alpha", type=float, default=0.05)
    args = ap.parse_args()

    rows, missing = [], []
    for model in zoo.list_models():
        path = find_artifact(model)
        if path is None:
            missing.append(model)
            continue
        with open(path) as f:
            art = json.load(f)
        pv = art.get("sbc_pvalues", {})
        for param, p in pv.items():
            rows.append({"model": model, "param": param, "p": float(p),
                         "artifact": os.path.basename(path)})
    p = np.array([r["p"] for r in rows])
    q = benjamini_hochberg(p)
    for r, qi in zip(rows, q):
        r["q"] = float(qi)
    rows.sort(key=lambda r: r["q"])
    out = {
        "n_models": len(set(r["model"] for r in rows)),
        "n_tests": len(rows),
        "alpha": args.alpha,
        "min_q": float(q.min()),
        "n_rejected": int((q < args.alpha).sum()),
        "claim_no_miscalibration": bool(q.min() > args.alpha),
        "expected_raw_flags_under_null": float(args.alpha * len(rows)),
        "n_raw_below_alpha": int((p < args.alpha).sum()),
        "missing_models": missing,
        "rows": rows,
    }
    with open(args.out + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}, indent=2))
    for r in rows[:12]:
        print(f"  {r['model']:40s} {r['param']:12s} p={r['p']:.4f} "
              f"q={r['q']:.3f}  [{r['artifact']}]")


if __name__ == "__main__":
    main()
