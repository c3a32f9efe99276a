# -*- coding: utf-8 -*-
"""Model registry: select model + batch kind by ``cfg.model_type``, the
TPU-native equivalent of the reference's import-time module selection
(``train.py:9-14``)."""

from __future__ import annotations

from typing import Tuple

from drin_tpu.common.config import Config


def get_model(cfg: Config) -> Tuple[object, str]:
    """Return ``(flax module, batch kind)`` for the configured model.

    Batch kind selects the dataset assembly path: 'drin' -> the 15-tensor
    DRIN batch, 'baseline' -> the 9-tensor offline baseline batch."""
    if cfg.model_type == "drin":
        from drin_tpu.models.drin import DRIN

        return DRIN(cfg), "drin"
    if cfg.model_type == "ghmfc":
        if cfg.online_bert:
            from drin_tpu.encoders.bert import BertConfig
            from drin_tpu.models.ghmfc import GHMFCOnline

            if cfg.bert_checkpoint:  # dims from the checkpoint
                from drin_tpu.encoders.checkpoints import load_bert

                bert_cfg, _ = load_bert(cfg.bert_checkpoint)
            else:
                bert_cfg = BertConfig(max_position_embeddings=cfg.max_bert_len)
            return GHMFCOnline(cfg, bert_cfg), "online"
        from drin_tpu.models.ghmfc import GHMFC

        return GHMFC(cfg), "baseline"
    if cfg.model_type == "melhi":
        if cfg.dataset_name != "wikidiverse":
            # same guard as the reference (melhi.py:12-15)
            raise NotImplementedError("melhi is only implemented for wikidiverse")
        from drin_tpu.models.melhi import MELHI

        return MELHI(cfg), "baseline"
    raise ValueError(f"unknown model_type: {cfg.model_type}")
