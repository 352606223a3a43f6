#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json files (or a BENCH_r{N}.json with a
"queries" map): per-query delta, sorted by absolute regression, plus
added/removed queries and totals.

With --verdict OUT.json, additionally writes a machine-readable
CONTENTION VERDICT comparing the two runs' recorded process-CPU seconds:
identical plans on identical data cannot burn materially more CPU, so a
run whose common-query CPU total is far above the other's was measured on
a contended host — its wall-clock total indicts the host, not the code.
(That analysis previously had to be re-derived by hand each round; this
emits it as one citable artifact.)

Usage: bench_compare.py <old.json> <new.json> [min_delta_sec]
                        [--verdict OUT.json]
"""
import json
import sys


def load_raw(path):
    d = json.load(open(path))
    if "queries" not in d and "tail" in d:
        # driver-wrapped BENCH_r{N}.json: the bench's one-line JSON sits at
        # the end of the captured stdout tail
        for line in reversed(d["tail"].splitlines()):
            i = line.find('{"metric"')
            if i >= 0:
                d = json.loads(line[i:])
                break
    return d


def queries_of(d):
    return {k: v for k, v in d.get("queries", {}).items()
            if not k.startswith("_other") and isinstance(v, (int, float))
            and v >= 0}


def load(path):
    return queries_of(load_raw(path))


def contention_verdict(old_path, new_path):
    do, dn = load_raw(old_path), load_raw(new_path)
    old, new = queries_of(do), queries_of(dn)
    cpu_old = do.get("cpu_secs", {}) or {}
    cpu_new = dn.get("cpu_secs", {}) or {}
    both = sorted(set(old) & set(new))
    cpu_both = [q for q in both if q in cpu_old and q in cpu_new
                and cpu_old[q] > 0 and cpu_new[q] > 0]
    wall_o = sum(old[q] for q in both)
    wall_n = sum(new[q] for q in both)
    co = sum(cpu_old[q] for q in cpu_both)
    cn = sum(cpu_new[q] for q in cpu_both)
    per_query = sorted(
        ({"query": q, "wall_old_s": round(old[q], 3),
          "wall_new_s": round(new[q], 3),
          "cpu_old_s": round(cpu_old.get(q, -1), 3),
          "cpu_new_s": round(cpu_new.get(q, -1), 3),
          "cpu_ratio": round(cpu_new[q] / cpu_old[q], 2)
          if q in cpu_both else None}
         for q in both),
        key=lambda r: -(r["wall_new_s"] - r["wall_old_s"]))
    cpu_ratio = cn / co if co > 0 else None
    wall_ratio = wall_n / wall_o if wall_o > 0 else None
    # Single-query CPU outliers against flat controls: identical plans
    # whose CPU near-triples in ONE query while every other query stays
    # CPU-flat (the r16 suffix_sharded_excise shape) are NOT host
    # contention — contention inflates broadly. Flag them so a
    # "comparable" verdict can never paper over one; gc_secs (when the
    # bench recorded it) says whether the excess was collector work.
    gc_old = do.get("gc_secs", {}) or {}
    gc_new = dn.get("gc_secs", {}) or {}
    sizable = [q for q in cpu_both
               if max(cpu_old[q], cpu_new[q]) >= 2.0]
    ratios = sorted(cpu_new[q] / cpu_old[q] for q in sizable)
    median_ratio = ratios[len(ratios) // 2] if ratios else None
    controls_flat = median_ratio is not None and 0.8 <= median_ratio <= 1.25
    cpu_outliers = []
    if controls_flat:
        for q in sizable:
            r = cpu_new[q] / cpu_old[q]
            if r >= 2.0 or r <= 0.5:
                row = {"query": q, "cpu_old_s": round(cpu_old[q], 1),
                       "cpu_new_s": round(cpu_new[q], 1),
                       "cpu_ratio": round(r, 2)}
                if q in gc_old or q in gc_new:
                    row["gc_old_s"] = round(gc_old.get(q, 0.0), 1)
                    row["gc_new_s"] = round(gc_new.get(q, 0.0), 1)
                cpu_outliers.append(row)
        cpu_outliers.sort(key=lambda r: -r["cpu_ratio"])
    if cpu_ratio is None:
        verdict, why = "no-cpu-data", \
            "one run lacks cpu_secs; wall totals alone cannot separate " \
            "code regressions from host contention"
    elif cpu_ratio > 1.5:
        verdict, why = "new-run-contended", \
            (f"the new run burned {cpu_ratio:.2f}x the CPU of the old run "
             f"on the same {len(cpu_both)} queries — identical plans "
             "cannot do that; the wall-clock total indicts the "
             "measurement host, not the code")
    elif cpu_ratio < 1 / 1.5:
        verdict, why = "old-run-contended", \
            (f"the OLD run burned {1/cpu_ratio:.2f}x the CPU of the new "
             f"run on the same {len(cpu_both)} queries — its wall total "
             "reflects a contended host")
    elif wall_ratio is not None and wall_ratio > 1.25 and cpu_ratio < 1.2:
        verdict, why = "new-run-starved", \
            (f"wall inflated {wall_ratio:.2f}x with CPU within "
             f"{cpu_ratio:.2f}x — the new run waited (starved executors / "
             "busy host), it did not compute more")
    elif wall_ratio is not None and abs(wall_ratio - 1) <= 0.25:
        if cpu_outliers:
            names = ", ".join(
                f"{r['query']} {r['cpu_ratio']}x" for r in cpu_outliers[:5])
            verdict, why = "comparable-except-outliers", \
                (f"wall {wall_ratio:.2f}x and CPU {cpu_ratio:.2f}x overall, "
                 f"but {len(cpu_outliers)} quer"
                 f"{'y' if len(cpu_outliers) == 1 else 'ies'} swung >=2x in "
                 f"CPU while the median stayed {median_ratio:.2f}x ({names})"
                 " — contention inflates broadly, so these are per-query "
                 "artifacts (GC, run order, or a real regression); "
                 "adjudicate them individually before calling the runs "
                 "comparable")
        else:
            verdict, why = "comparable", \
                (f"wall {wall_ratio:.2f}x and CPU {cpu_ratio:.2f}x on "
                 f"{len(both)} common queries — runs are comparable; "
                 "per-query deltas reflect the code")
    else:
        verdict, why = "inspect-per-query", \
            (f"wall {wall_ratio:.2f}x with CPU {cpu_ratio:.2f}x — no "
             "single host-level explanation; read the per_query rows")
    return {
        "old": old_path, "new": new_path,
        "n_common": len(both), "n_with_cpu": len(cpu_both),
        "wall_old_s": round(wall_o, 1), "wall_new_s": round(wall_n, 1),
        "wall_ratio": round(wall_ratio, 3) if wall_ratio else None,
        "cpu_old_s": round(co, 1), "cpu_new_s": round(cn, 1),
        "cpu_ratio": round(cpu_ratio, 3) if cpu_ratio else None,
        "verdict": verdict, "rationale": why,
        "cpu_median_ratio": round(median_ratio, 3) if median_ratio else None,
        "cpu_outliers": cpu_outliers,
        "per_query": per_query,
    }


def main():
    args = list(sys.argv[1:])
    verdict_out = None
    if "--verdict" in args:
        i = args.index("--verdict")
        if i + 1 >= len(args):
            sys.exit("usage: bench_compare.py <old.json> <new.json> "
                     "[min_delta_sec] [--verdict OUT.json]")
        verdict_out = args[i + 1]
        del args[i:i + 2]
    old_path, new_path = args[0], args[1]
    min_delta = float(args[2]) if len(args) > 2 else 0.5
    if verdict_out:
        v = contention_verdict(old_path, new_path)
        with open(verdict_out, "w") as f:
            json.dump(v, f, indent=1)
        print(f"[verdict] {v['verdict']}: {v['rationale']}")
        print(f"[verdict] written to {verdict_out}")
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
