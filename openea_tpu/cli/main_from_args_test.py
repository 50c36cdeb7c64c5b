"""Variant driver (reference run/main_from_args_test.py): same CLI contract
as main_from_args, pinned to its mode."""

from openea_tpu.cli.main_from_args import main

if __name__ == "__main__":
    mode = {"test": "test", "reversed": "rev", "wo_attr": "wo_attr"}["test"]
    raise SystemExit(main(None, mode=mode))
