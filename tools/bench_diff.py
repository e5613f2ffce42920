#!/usr/bin/env python3
"""Per-query bench regression diff.

Usage: python3 tools/bench_diff.py <baseline.json> <current.json> [ratio]

Compares per-query seconds between two Bench outputs (e.g. the previous
round's BENCH_r{N}.json and a fresh local run). Flags queries slower
than `ratio` x baseline (default 1.5) AND more than 0.2s absolute — the
absolute floor keeps sub-100ms queries from tripping on scheduler noise.
Exit 1 iff any regression is flagged.
"""
import sys, json, re


def load(path):
    with open(path) as f:
        txt = f.read()
    # driver BENCH files may wrap (or truncate) the JSON line in a
    # {"tail": ...} envelope; fall back to scraping "name":seconds pairs
    try:
        d = json.loads(txt)
        if "queries" in d:
            return d
        txt = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    for line in txt.splitlines():
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if "queries" in d:
                    return d
            except json.JSONDecodeError:
                pass
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', txt)
    qs = {k: float(v) for k, v in pairs if not k.startswith(("metric", "value", "sf"))}
    return {"queries": qs}


def main():
    base, cur = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    bq, cq = base["queries"], cur["queries"]
    regressions, improved, new = [], [], []
    for name, t in sorted(cq.items()):
        if name not in bq:
            new.append((name, t))
            continue
        b = bq[name]
        if t > b * ratio and t - b > 0.2:
            regressions.append((name, b, t))
        elif b > t * ratio and b - t > 0.2:
            improved.append((name, b, t))
    print(f"baseline total {sum(bq.values()):.2f}s ({len(bq)} queries); "
          f"current total {sum(cq.values()):.2f}s ({len(cq)} queries)")
    for n, t in new:
        print(f"NEW       {n}: {t:.3f}s")
    for n, b, t in improved:
        print(f"IMPROVED  {n}: {b:.3f}s -> {t:.3f}s")
    for n, b, t in regressions:
        print(f"REGRESSED {n}: {b:.3f}s -> {t:.3f}s")
    if not regressions:
        print("no regressions")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
