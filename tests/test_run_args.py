"""Every shipped run_args/*.json loads through the CLI config path and
passes its model's check_args contract (mirrors the reference's run/args
directory of per-(approach, scale) JSONs)."""

import glob
import os

import pytest

from openea_tpu.config import load_args
from openea_tpu.registry import get_model

JSONS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "run_args", "*.json")))


def test_full_set_present():
    # 27 presets x {15K, 100K}
    assert len(JSONS) >= 54


@pytest.mark.parametrize("path", JSONS, ids=[os.path.basename(p) for p in JSONS])
def test_json_loads_and_checks(path):
    args = load_args(path)
    model = get_model(args.embedding_module)()
    model.args = args
    model.check_args()
