"""Mesh coverage across the preset zoo: every base-family preset trains
with use_mesh=True (row-sharded tables over 'model', batch over 'data')
— the breadth counterpart to the per-model parity tests (GCN-Align /
RDGCN / AliNet / BootEA have their own boundary-exchange paths)."""

import jax
import numpy as np
import pytest

from openea_tpu.config import Args
from openea_tpu.data.synthetic import synthesize_kg_pair
from openea_tpu.presets import get_preset_dict
from openea_tpu.registry import get_model

BASE_FAMILY = ["transe", "transh", "transr", "transd", "distmult", "hole",
               "simple", "rotate", "proje", "conve", "mtranse", "aligne",
               "jape", "iptranse", "sea", "attre"]

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@pytest.fixture(scope="module")
def tiny_kgs():
    return synthesize_kg_pair(num_entities=240, num_relations=8,
                              num_triples=1500, mode="mapping",
                              train_frac=0.3, num_attributes=20, seed=11)


@pytest.mark.slow
@pytest.mark.parametrize("preset", BASE_FAMILY)
def test_preset_trains_on_mesh(preset, tiny_kgs):
    vals = get_preset_dict(preset, "15K")
    vals.update(dim=32, batch_size=256, max_epoch=2, start_valid=1000,
                eval_freq=1000, is_save=False, seed=0, use_mesh=True,
                top_k=[1, 5])
    model = get_model(vals["embedding_module"])()
    model.set_args(Args(vals))
    model.set_kgs(tiny_kgs)
    model.init()
    assert model.mesh is not None and model.mesh.size == 8
    model.run()
    if "ent_embeds" in model.params:
        assert model.params["ent_embeds"].sharding.spec[0] == "model"
        assert np.isfinite(np.asarray(model.params["ent_embeds"])).all()
