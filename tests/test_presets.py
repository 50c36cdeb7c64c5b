"""Preset registry: every preset resolves, instantiates its model class,
and passes that model's check_args contract."""

import pytest

from openea_tpu.presets import get_preset, preset_names
from openea_tpu.registry import available_models, get_model

# every reference model is implemented; nothing pending
PENDING = set()


@pytest.mark.parametrize("name", preset_names())
def test_preset_resolves_and_checks(name):
    args = get_preset(name, "15K")
    module = args.embedding_module
    if module in PENDING:
        pytest.skip(f"{module} model not implemented yet")
    model = get_model(module)()
    model.args = args
    model.check_args()


@pytest.mark.parametrize("name", preset_names())
def test_preset_100k_scale(name):
    args = get_preset(name, "100K")
    assert args.batch_size >= 512


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        get_preset("nope")
