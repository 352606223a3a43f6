#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json files (or a BENCH_r{N}.json with a
"queries" map): per-query delta, sorted by absolute regression, plus
added/removed queries and totals.

Usage: bench_compare.py <old.json> <new.json> [min_delta_sec]
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "queries" not in d and "tail" in d:
        # driver-wrapped BENCH_r{N}.json: the bench's one-line JSON sits at
        # the end of the captured stdout tail
        for line in reversed(d["tail"].splitlines()):
            i = line.find('{"metric"')
            if i >= 0:
                d = json.loads(line[i:])
                break
    return {k: v for k, v in d.get("queries", {}).items()
            if not k.startswith("_other") and isinstance(v, (int, float))
            and v >= 0}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    min_delta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    old, new = load(old_path), load(new_path)
    both = sorted(set(old) & set(new),
                  key=lambda q: -(new[q] - old[q]))
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    shown = 0
    for q in both:
        delta = new[q] - old[q]
        if abs(delta) >= min_delta:
            print(f"{q:40s} {old[q]:8.2f} {new[q]:8.2f} {delta:+8.2f}")
            shown += 1
    if not shown:
        print(f"(no per-query delta >= {min_delta}s)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added   ({len(added)}): " +
              ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    t_old = sum(v for v in old.values() if v >= 0)
    t_new = sum(v for v in new.values() if v >= 0)
    t_common_old = sum(old[q] for q in both)
    t_common_new = sum(new[q] for q in both)
    print(f"totals: old {t_old:.1f}s ({len(old)}q), new {t_new:.1f}s "
          f"({len(new)}q); common-query delta "
          f"{t_common_new - t_common_old:+.1f}s over {len(both)}q")


if __name__ == "__main__":
    main()
