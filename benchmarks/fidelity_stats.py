"""Paired per-slide statistics for the fidelity study (VERDICT r4 item 3).

The round-4 recommendation (ctx128 + fcn beats bare + exact at >=16 train
slides) rested on a mean and a sign count. This gives every comparison the
paired treatment the VERDICT asked for: per-slide deltas, exact two-sided
sign test, and a paired bootstrap (resample slides with replacement) 95% CI
of the mean delta — computed from the recorded map_eval rows in
fidelity_study_tpu.jsonl, so it re-runs offline for any tag.

Comparisons per tag:
  within-recipe   fcn_h32 vs exact, per train arm (serving-mode neutrality)
  cross-recipe    ctx<N> fcn_h32 vs ctx0 exact (the recommendation)

Usage: python benchmarks/fidelity_stats.py [--tags r4_data16,r5_data32]
Appends `kind: paired_stats` rows to the jsonl and prints a table.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from itertools import combinations
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def sign_test_p(n_pos: int, n_neg: int) -> float:
    """Exact two-sided binomial sign test (ties dropped)."""
    from math import comb

    n = n_pos + n_neg
    if n == 0:
        return 1.0
    k = min(n_pos, n_neg)
    tail = sum(comb(n, i) for i in range(k + 1)) / 2**n
    return min(1.0, 2 * tail)


def paired_bootstrap_ci(deltas, n_boot=10000, seed=0, alpha=0.05):
    rng = np.random.default_rng(seed)
    deltas = np.asarray(deltas, np.float64)
    idx = rng.integers(0, len(deltas), size=(n_boot, len(deltas)))
    means = deltas[idx].mean(axis=1)
    lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
    return float(lo), float(hi)


def analyze(rows, tag, emit):
    per_arm = defaultdict(dict)  # train_ctx -> slide -> row
    for r in rows:
        if r.get("tag") == tag and r.get("kind") == "map_eval":
            per_arm[r["train_ctx"]][r["slide"]] = r
    if not per_arm:
        return False

    def stats(name, a_key, a_field, b_key, b_field):
        slides = sorted(set(per_arm[a_key]) & set(per_arm[b_key]))
        deltas = [
            per_arm[a_key][s][a_field] - per_arm[b_key][s][b_field]
            for s in slides
        ]
        if not slides:
            return
        pos = sum(d > 0 for d in deltas)
        neg = sum(d < 0 for d in deltas)
        lo, hi = paired_bootstrap_ci(deltas)
        emit({
            "kind": "paired_stats", "tag": tag, "comparison": name,
            "n_slides": len(slides),
            "mean_delta_pts": round(100 * float(np.mean(deltas)), 2),
            "per_slide_pts": [round(100 * d, 2) for d in deltas],
            "positive_slides": pos, "negative_slides": neg,
            "sign_test_p": round(sign_test_p(pos, neg), 4),
            "bootstrap_ci95_pts": [round(100 * lo, 2), round(100 * hi, 2)],
        })

    for ctx in sorted(per_arm):
        stats(f"ctx{ctx}: fcn_h32 - exact", ctx, "acc_fcn_h32", ctx,
              "acc_exact")
    for ctx in sorted(per_arm):
        if ctx != 0 and 0 in per_arm:
            stats(f"cross-recipe: ctx{ctx} fcn_h32 - ctx0 exact", ctx,
                  "acc_fcn_h32", 0, "acc_exact")
    for a, b in combinations(sorted(per_arm), 2):
        stats(f"exact-vs-exact: ctx{b} - ctx{a}", b, "acc_exact", a,
              "acc_exact")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tags", default="r4_main,r4_data16,r4_hard16")
    ap.add_argument("--jsonl", default=str(HERE / "fidelity_study_tpu.jsonl"))
    args = ap.parse_args()

    path = Path(args.jsonl)
    rows = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    out = []

    def emit(row):
        row = {"measurement": "fidelity_study", **row}
        out.append(row)
        print(json.dumps(row), flush=True)

    for tag in args.tags.split(","):
        if not analyze(rows, tag, emit):
            print(f"# no map_eval rows for tag {tag!r}")
    with path.open("a") as f:
        for row in out:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
