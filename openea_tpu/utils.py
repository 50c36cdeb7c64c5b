"""Small host-side utilities (reference modules/utils/util.py:6-39)."""

from __future__ import annotations

import time
from typing import List, Sequence


def task_divide(idx: Sequence, n: int) -> List[Sequence]:
    total = len(idx)
    if n <= 0 or total == 0 or n > total:
        return [idx]
    if n == total:
        return [[i] for i in idx]
    j = total // n
    tasks = [idx[i:i + j] for i in range(0, (n - 1) * j, j)]
    tasks.append(idx[(n - 1) * j:])
    return tasks


def merge_dic(a: dict, b: dict) -> dict:
    return {**a, **b}


def generate_out_folder(out_folder: str, training_data_path: str,
                        div_path: str, method_name: str) -> str:
    """<output>/<Method>/<dataset>/<division><timestamp>/ — same layout as
    the reference so its log/statistics tooling keeps working."""
    dataset = training_data_path.strip("/").split("/")[-1]
    stamp = time.strftime("%Y%m%d%H%M%S")
    folder = f"{out_folder}{method_name}/{dataset}/{div_path}{stamp}/"
    return folder
