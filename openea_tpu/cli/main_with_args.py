"""Argparse experiment driver (reference run/main_with_args.py:30-170).

Every config key is addressable as a flag; unknown ``--key value`` pairs
pass straight into the config bag (the reference enumerates ~40 per-model
flags by hand — here the config system's passthrough does it):

    python -m openea_tpu.cli.main_with_args --embedding_module BootEA \\
        --training_data data/ --dataset EN_FR_15K_V1 --split 721_5fold/1/ \\
        --batch_size 5000 --sim_th 0.7
"""

from __future__ import annotations

import argparse
import json
import time

from openea_tpu.config import Args
from openea_tpu.data.kg import read_kgs_from_folder
from openea_tpu.presets import PRESETS_15K, get_preset_dict
from openea_tpu.registry import get_model


def _coerce(v: str):
    try:
        return json.loads(v)
    except (json.JSONDecodeError, ValueError):
        return v


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="openea_tpu experiment driver")
    parser.add_argument("--embedding_module", type=str, required=True)
    parser.add_argument("--training_data", type=str, default="data/")
    parser.add_argument("--dataset", type=str, default="")
    parser.add_argument("--split", type=str, default="721_5fold/1/")
    parser.add_argument("--preset_scale", type=str, default="15K",
                        help="base preset scale to start from (15K|100K)")
    known, rest = parser.parse_known_args(argv)

    # start from the model's benchmark preset, overlay CLI overrides
    name = known.embedding_module.lower()
    base = {}
    if name in PRESETS_15K:
        base = get_preset_dict(name, known.preset_scale)
    base["embedding_module"] = known.embedding_module
    base["training_data"] = known.training_data + (
        known.dataset + "/" if known.dataset else "")
    base["dataset_division"] = known.split
    it = iter(rest)
    for tok in it:
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument {tok!r}")
        key = tok[2:]
        try:
            base[key] = _coerce(next(it))
        except StopIteration:
            raise SystemExit(f"flag {tok} needs a value")
    args = Args(base)

    t = time.time()
    remove_unlinked = args.embedding_module == "RSN4EA"
    kgs = read_kgs_from_folder(args.training_data, args.dataset_division,
                               args.alignment_module, args.ordered,
                               remove_unlinked=remove_unlinked)
    model = get_model(args.embedding_module)()
    model.set_args(args)
    model.set_kgs(kgs)
    model.init()
    model.run()
    model.test(save=True)
    model.save()
    print("Total run time = {:.3f} s.".format(time.time() - t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
