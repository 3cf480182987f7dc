#!/usr/bin/env python3
"""Compare two bench artifacts (BENCH_rN.json or a raw Bench stdout
line) and flag per-query regressions with base-time-aware thresholds.

Usage: python3 tools/bench_compare.py BENCH_r12.json BENCH_r13.json

A "regression" needs BOTH a ratio above the threshold AND an absolute
delta that matters (sub-second bases jitter 1.5x routinely — the r11
phantom-regression lesson). Thresholds: ratio >= 1.5 and delta >=
0.5 s, or ratio >= 2.0 with delta >= 0.2 s. Prints loadavg evidence
from both artifacts so contention is visible next to the numbers.

When BOTH artifacts carry per-query minimums ("queries_min" in the
final JSON, or a BENCHMIN line in raw stdout), regressions are judged
on the MIN ratio — the contention-free estimator for CPU-bound
queries (r15 verdict: every flagged flap collapsed on isolated
re-time; the min self-adjudicates those with zero re-runs). Medians
are still printed as context.
"""
import json
import re
import sys


def load(path):
    txt = open(path).read()
    raw = txt
    try:
        d = json.loads(txt)
        if "queries" in d:
            return d
        # driver artifact wrapper: the line lives in "tail" — which may
        # be TRUNCATED at the front (BENCH_r13.json starts mid-line), so
        # never require the '{"metric"' prefix: scrape the "queries"
        # object directly and whatever scalar fields survived.
        txt = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    out = None
    m = re.search(r'\{"metric".*\}', txt)
    if m:
        try:
            out = json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    if out is None:
        mq = re.search(r'"queries"\s*:\s*(\{[^{}]*\})', txt)
        if not mq:
            sys.exit(f"no bench JSON found in {path}")
        out = {"queries": json.loads(mq.group(1))}
        for scalar in ("value", "sf", "loadavg_per_pass", "contended"):
            ms = re.search(
                rf'"{scalar}"\s*:\s*("[^"]*"|\[[^\]]*\]|[^,}}]+)', txt)
            if ms:
                try:
                    out[scalar] = json.loads(ms.group(1))
                except json.JSONDecodeError:
                    out[scalar] = ms.group(1)
        mqm = re.search(r'"queries_min"\s*:\s*(\{[^{}]*\})', txt)
        if mqm:
            out["queries_min"] = json.loads(mqm.group(1))
    # raw stdout capture: the BENCHMIN diagnostic line carries the FULL
    # per-query minimum map (the artifact's "queries_min" is only the
    # headline subset)
    mb = re.search(r'BENCHMIN[^{]*(\{[^{}]*\})', raw)
    if mb:
        try:
            full_min = json.loads(mb.group(1))
            out.setdefault("queries_min", {}).update(full_min)
        except json.JSONDecodeError:
            pass
    return out


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    print(f"shared queries: {len(shared)}  "
          f"(only-old: {len(set(qa) - set(qb))}, "
          f"only-new: {len(set(qb) - set(qa))})")
    print(f"old loadavg/pass: {a.get('loadavg_per_pass', 'n/a')}"
          f"  contended: {a.get('contended', 'n/a')}")
    print(f"new loadavg/pass: {b.get('loadavg_per_pass', 'n/a')}"
          f"  contended: {b.get('contended', 'n/a')}")
    ma, mb = a.get("queries_min", {}), b.get("queries_min", {})
    use_min = bool(set(ma) & set(mb) & set(shared))
    if use_min:
        print("adjudicating on MIN ratios (both sides carry minimums); "
              "medians shown as context")
    regressions, improvements = [], []
    for q in shared:
        # a query missing from either side's minimums falls back to
        # median adjudication — tag each row with the estimator USED so
        # mixed estimators stay distinguishable in the output
        judged_min = use_min and q in ma and q in mb
        old, new = (ma[q], mb[q]) if judged_min else (qa[q], qb[q])
        ratio = new / max(old, 0.01)
        if (ratio >= 1.5 and new - old >= 0.5) or \
                (ratio >= 2.0 and new - old >= 0.2):
            regressions.append((ratio, q, old, new, judged_min))
        elif ratio <= 1 / 1.5 and old - new >= 0.5:
            improvements.append((ratio, q, old, new, judged_min))
    for tag, rows in (("REGRESSION", sorted(regressions, reverse=True)),
                      ("improved", sorted(improvements))):
        for ratio, q, old, new, judged_min in rows:
            ctx = f"  [med {qa[q]:.2f} -> {qb[q]:.2f}]" if judged_min \
                else ("  [MEDIAN-judged: no min on one side]"
                      if use_min else "")
            print(f"{tag:>10}  {q}: {old:.2f} -> {new:.2f} s "
                  f"({ratio:.2f}x){ctx}")
    tot_a = sum(qa[q] for q in shared)
    tot_b = sum(qb[q] for q in shared)
    print(f"shared-query totals: {tot_a:.1f} -> {tot_b:.1f} s "
          f"({tot_b / max(tot_a, 0.01):.2f}x)")
    if not regressions:
        print("no regressions above threshold")


if __name__ == "__main__":
    main()
