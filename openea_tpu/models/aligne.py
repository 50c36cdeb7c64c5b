"""AlignE: parameter-swapping TransE with limited loss + truncated negative
sampling (reference approaches/aligne.py:15-66).

All mechanism lives in the base template: swapping mode augments each KG
with counterpart triples at load time, the limited loss comes from
get_loss_func, and truncated sampling is the on-device neighbor table.
"""

from __future__ import annotations

from openea_tpu.models.base import BasicModel


class AlignE(BasicModel):

    def check_args(self):
        a = self.args
        assert a.init == "normal"
        assert a.alignment_module == "swapping"
        assert a.loss == "limited"
        assert a.neg_sampling == "truncated"
        assert a.optimizer == "Adagrad"
        assert a.eval_metric == "inner"
        assert a.loss_norm == "L2"
        assert a.ent_l2_norm is True
        assert a.rel_l2_norm is True
        assert a.pos_margin >= 0.0
        assert a.neg_margin > a.pos_margin
        assert a.neg_triple_num > 1
        assert a.truncated_epsilon > 0.0
        assert a.learning_rate >= 0.01
