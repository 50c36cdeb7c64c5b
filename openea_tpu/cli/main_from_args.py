"""CLI: ``python -m openea_tpu.cli.main_from_args <args.json> <dataset> <split>``

Same contract as the reference driver (run/main_from_args.py:79-98):
positional overrides replace the dataset folder name and split division in
the JSON preset, then the pipeline is read_kgs -> set_args -> set_kgs ->
init -> run -> test -> save.

Instead of a JSON path, the first argument may also be a built-in preset:
``preset:<name>_<scale>``, e.g. ``preset:bootea_15K`` (see
openea_tpu/presets.py for the registry).
"""

from __future__ import annotations

import sys
import time

from openea_tpu.config import load_args
from openea_tpu.data.kg import read_kgs_from_folder
from openea_tpu.registry import get_model


def _resolve_args(spec: str):
    if spec.startswith("preset:"):
        from openea_tpu.presets import get_preset
        name = spec[len("preset:"):]
        base, _, scale = name.rpartition("_")
        if not base:
            base, scale = name, "15K"
        return get_preset(base, scale)
    return load_args(spec)


def main(argv=None, mode: str = "full"):
    """mode: full | test (re-evaluate saved embeddings) | rev (align
    KG2->KG1) | wo_attr (attribute-free ablation) | mesh (multi-chip
    training: tables row-sharded over a device mesh, sharded CSLS eval).
    The first four are the sweep modes of the reference's run_15K.sh /
    variant drivers (main_from_args_test.py, main_from_args_reversed.py,
    main_from_args_wo_attr.py); mesh is new capability — the reference
    pins one GPU (run/run_15K.sh:96)."""
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print(__doc__)
        return 1
    t = time.time()
    args = _resolve_args(argv[0])
    # OPENEA_DATA_ROOT overrides the preset's data root (run/sweep.sh -t;
    # built-in presets default to the reference's ../../datasets/ layout)
    import os
    root = os.environ.get("OPENEA_DATA_ROOT")
    if root:
        args.training_data = root.rstrip("/") + "/"
    if len(argv) >= 2:
        args.training_data = args.training_data + argv[1] + "/"
    if len(argv) >= 3:
        args.dataset_division = argv[2]
    if len(argv) >= 4:
        mode = argv[3]
    print(args.embedding_module, args.training_data, args.dataset_division)

    if mode == "wo_attr":
        args.use_attributes = False
    if mode == "mesh":
        args.use_mesh = True
    remove_unlinked = args.embedding_module == "RSN4EA"
    if mode == "rev":
        from openea_tpu.data.kg import read_reversed_kgs_from_folder
        kgs = read_reversed_kgs_from_folder(
            args.training_data, args.dataset_division, args.alignment_module,
            args.ordered, remove_unlinked=remove_unlinked)
    else:
        kgs = read_kgs_from_folder(args.training_data, args.dataset_division,
                                   args.alignment_module, args.ordered,
                                   remove_unlinked=remove_unlinked)
    model = get_model(args.embedding_module)()
    model.set_args(args)
    model.set_kgs(kgs)
    if mode == "test":
        model.retest()
    else:
        model.init()
        model.run()
        model.test(save=True)
        model.save()
    print("Total run time = {:.3f} s.".format(time.time() - t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
