"""Compare two bench JSON records and flag per-query regressions.

    python tools/compare_bench.py BENCH_r03.json BENCH_r04.json [--threshold 1.5]

Raw per-query walls on this shared VM swing 3-5x with host load, so naive
old/new ratios are meaningless across runs.  The comparison therefore
normalizes by the `host_probe_sec` each record carries (bench.py measures a
fixed single-thread workload at record time): a query is flagged only when

    (new_sec / old_sec) > threshold * (new_probe / old_probe)

i.e. it got slower by more than the host itself did.  Exit code 1 when any
regression is flagged — usable as a pre-commit / CI gate on bench records.

Caveat: the probe measures SINGLE-THREAD speed; this VM's boot-to-boot
anti-scaling of parallel allocation-heavy work (BASELINE.md host quirks) is
not captured, so flags from cross-BOOT comparisons need BASELINE context —
same-boot records (e.g. r02 vs r03) compare cleanly.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    try:  # a pretty-printed record is one JSON document
        d = json.loads(txt)
        # the round driver wraps bench output under "parsed"
        return d["parsed"] if isinstance(d.get("parsed"), dict) else d
    except json.JSONDecodeError:
        pass
    # otherwise: the record is the last parseable JSON line of a log
    for line in reversed(txt.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise ValueError(f"no JSON record in {path}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    p_old = float(old.get("host_probe_sec") or 1.0)
    p_new = float(new.get("host_probe_sec") or 1.0)
    host_ratio = p_new / p_old if p_old > 0 else 1.0
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    shared = sorted(set(qo) & set(qn))
    flagged, improved = [], 0
    for name in shared:
        o, n = float(qo[name]), float(qn[name])
        if o <= 0:
            continue
        ratio = n / o
        if ratio > args.threshold * host_ratio:
            flagged.append((name, o, n, round(ratio, 2)))
        elif ratio < 1.0:
            improved += 1
    print(
        f"compared {len(shared)} shared queries | host probe {p_old} -> {p_new} "
        f"(x{host_ratio:.2f}) | threshold x{args.threshold} host-adjusted"
    )
    hv = [(k, old.get(k), new.get(k)) for k in ("value", "docs_per_sec", "curation_500k_sec")]
    for k, o, n in hv:
        if o is not None and n is not None:
            print(f"  {k}: {o} -> {n}")
    print(f"  improved: {improved}, flagged: {len(flagged)}")
    for name, o, n, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"  REGRESSION {name}: {o}s -> {n}s (x{r})")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
