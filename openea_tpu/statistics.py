"""Run-log statistics tooling (reference run/statistics/log2excel.py,
run_time.py, degree_interval.py).

Parses the framework's (reference-format) log lines — `accurate results:
hits@[...] = [...]%, mr = ..., mrr = ...`, per-phase `... time/costs ... s`
— into structured records, and aggregates folds into mean/std summary CSVs
(the reference emits xlwt Excel sheets; CSV keeps the same content without
the xlwt dependency)."""

from __future__ import annotations

import csv
import os
import re
from typing import Dict, List, Optional

_ACC = re.compile(
    r"accurate results(?P<csls> with csls: csls=\d+,)?:? hits@\[(?P<ks>[^\]]*)\]"
    r" = \[(?P<hits>[^\]]*)\]%, mr = (?P<mr>[\d.]+), mrr = (?P<mrr>[\d.]+)")
_TIME = re.compile(r"[Tt]ime = ([\d.]+) s|costs? ([\d.]+) s|([\d.]+)s$")
_TOTAL = re.compile(r"Total run time = ([\d.]+) s")


def parse_log(path: str) -> Dict:
    """Last plain + csls accurate-result lines, plus total time and the
    sum of all per-phase timings (reference run_time.py:4-30)."""
    out: Dict = {"file": os.path.basename(path), "plain": None, "csls": None,
                 "total_time": None, "summed_time": 0.0}
    with open(path, "r", encoding="utf8", errors="ignore") as f:
        for line in f:
            m = _ACC.search(line)
            if m:
                rec = {
                    "top_k": [int(k) for k in m.group("ks").replace(",", " ").split()],
                    "hits": [float(h) for h in m.group("hits").split()],
                    "mr": float(m.group("mr")),
                    "mrr": float(m.group("mrr")),
                }
                out["csls" if m.group("csls") else "plain"] = rec
            mt = _TOTAL.search(line)
            if mt:
                out["total_time"] = float(mt.group(1))
                continue  # the total line must not inflate the phase sum
            # one phase timing per line: a line like "cost time: 1.2s" can
            # match several _TIME alternatives; take only the first match
            m = _TIME.search(line)
            if m:
                out["summed_time"] += float(next(g for g in m.groups() if g))
    return out


def logs_to_csv(log_paths: List[str], out_csv: str,
                variant: str = "plain") -> List[Dict]:
    """One row per log: hits@k columns + mr/mrr/time; final mean/std rows
    over all parsed folds (the reference's 5-fold summary block)."""
    rows = []
    for p in log_paths:
        rec = parse_log(p)
        r = rec[variant]
        if r is None:
            continue
        row = {"log": rec["file"], "mr": r["mr"], "mrr": r["mrr"],
               "time_s": rec["total_time"] or rec["summed_time"]}
        for k, h in zip(r["top_k"], r["hits"]):
            row[f"hits@{k}"] = h
        rows.append(row)
    if not rows:
        return rows
    keys = list(rows[0].keys())
    import numpy as np
    numeric = [k for k in keys if k != "log"]
    mean_row = {"log": "mean"}
    std_row = {"log": "std"}
    for k in numeric:
        vals = np.asarray([r[k] for r in rows], float)
        mean_row[k] = round(float(vals.mean()), 5)
        std_row[k] = round(float(vals.std()), 5)
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    with open(out_csv, "w", newline="", encoding="utf8") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows + [mean_row, std_row]:
            w.writerow(r)
    return rows


def csv_to_latex(csv_path: str, out_path: Optional[str] = None,
                 caption: str = "") -> str:
    """Summary CSV -> LaTeX tabular (reference run/statistics/excel2latex.py)."""
    with open(csv_path, "r", encoding="utf8") as f:
        rows = list(csv.reader(f))
    if not rows:
        return ""
    head, body = rows[0], rows[1:]
    lines = ["\\begin{table}[ht]", "\\centering",
             "\\begin{tabular}{" + "l" + "r" * (len(head) - 1) + "}",
             "\\toprule",
             " & ".join(h.replace("_", "\\_") for h in head) + " \\\\",
             "\\midrule"]
    for r in body:
        lines.append(" & ".join(str(c).replace("_", "\\_") for c in r) + " \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    if caption:
        lines.append(f"\\caption{{{caption}}}")
    lines.append("\\end{table}")
    out = "\n".join(lines)
    if out_path:
        with open(out_path, "w", encoding="utf8") as f:
            f.write(out)
    return out


def degree_interval_accuracy(kgs, alignment_pairs, intervals=(1, 3, 5, 10,
                                                              1 << 30)):
    """Hits@1 per source-entity degree bucket (reference
    run/statistics/degree_interval.py): how accuracy varies with how
    connected the entity is."""
    deg = {}
    for h, _, t in kgs.kg1.local_relation_triples_set:
        deg[h] = deg.get(h, 0) + 1
        deg[t] = deg.get(t, 0) + 1
    gold = dict(zip(kgs.test_entities1, kgs.test_entities2))
    buckets = {}
    for e1, e2 in alignment_pairs:
        d = deg.get(e1, 0)
        for ub in intervals:
            if d <= ub:
                b = buckets.setdefault(ub, [0, 0])
                b[1] += 1
                if gold.get(e1) == e2:
                    b[0] += 1
                break
    out = {}
    for ub in intervals:
        if ub in buckets:
            correct, total = buckets[ub]
            label = f"<={ub}" if ub < (1 << 30) else f">{intervals[-2]}"
            out[label] = (correct / total, total)
    for label, (acc, total) in out.items():
        print(f"degree {label}: hits@1 = {acc:.3f} ({total} entities)")
    return out
