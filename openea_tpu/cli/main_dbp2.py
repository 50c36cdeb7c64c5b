"""DBP2.0 dangling-entity CLI (reference dbp2.0/main.py).

python -m openea_tpu.cli.main_dbp2 --training_data <folder> [flags]
"""

from __future__ import annotations

import argparse

from openea_tpu.config import Args
from openea_tpu.dbp2.kgs import read_dbp2_kgs_from_folder
from openea_tpu.dbp2.mtranse_v2 import MTransEV2


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="NullEA (DBP2.0 dangling EA)")
    p.add_argument("--training_data", type=str, default="../data/DBP2.0/zh_en/")
    p.add_argument("--output", type=str, default="output/results/")
    p.add_argument("--dataset_division", type=str, default="splits")
    p.add_argument("--align_direction", type=str, default="left",
                   choices=("left", "right"))
    p.add_argument("--detection_mode", type=str, default="margin")
    p.add_argument("--init", type=str, default="xavier")
    p.add_argument("--alignment_module", type=str, default="mapping")
    p.add_argument("--neg_sampling", type=str, default="truncated")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--loss_norm", type=str, default="L2")
    p.add_argument("--batch_size", type=int, default=20480)
    p.add_argument("--embed_margin", type=float, default=1.5)
    p.add_argument("--mapping_margin", type=float, default=1.0)
    p.add_argument("--mapping_neg_num", type=int, default=10)
    p.add_argument("--soft_nn", type=int, default=10)
    p.add_argument("--distance_margin", type=float, default=0.9)
    p.add_argument("--neg_triple_num", type=int, default=1)
    p.add_argument("--truncated_epsilon", type=float, default=0.95)
    p.add_argument("--truncated_freq", type=int, default=10)
    p.add_argument("--start_class", type=int, default=0)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--optimizer", type=str, default="Adam")
    p.add_argument("--max_epoch", type=int, default=400)
    p.add_argument("--eval_freq", type=int, default=10)
    p.add_argument("--start_valid", type=int, default=0)
    p.add_argument("--stop_metric", type=str, default="mrr")
    p.add_argument("--eval_metric", type=str, default="inner")
    p.add_argument("--eval_norm", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    args = Args(vars(ns))
    args.ent_l2_norm = True
    args.rel_l2_norm = True
    args.top_k = [1, 5, 10]
    kgs = read_dbp2_kgs_from_folder(ns.training_data, ns.dataset_division,
                                    ns.alignment_module, True,
                                    ns.align_direction)
    model = MTransEV2()
    model.set_args(args)
    model.set_kgs(kgs)
    model.init()
    model.run()
    model.test(save=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
