# -*- coding: utf-8 -*-
"""Preprocessing CLI: ``python -m drin_tpu.preprocess <stage> [key=value ...]``.

Stages: prepare, bert, resnet, clip, all.  Config overrides work like
train.py (e.g. ``dataset_name=wikimel bert_checkpoint=/path/sd.pt``)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit(__doc__)
    stage, rest = argv[0], argv[1:]

    from train import parse_overrides
    from drin_tpu.common.config import make_config

    overrides = parse_overrides(rest)
    model_type = overrides.pop("model_type", "drin")
    dataset_name = overrides.pop("dataset_name", "wikidiverse")
    cfg = make_config(model_type, dataset_name, **overrides)

    if stage in ("prepare", "all"):
        from drin_tpu.preprocess.prepare import run_prepare

        run_prepare(cfg)
    if stage in ("bert", "all"):
        from drin_tpu.preprocess.stages import BertStage

        BertStage(cfg).run()
    if stage in ("resnet", "all"):
        from drin_tpu.preprocess.stages import ResnetStage

        ResnetStage(cfg).run()
    if stage in ("clip", "all"):
        from drin_tpu.preprocess.stages import ClipStage

        ClipStage(cfg).run()
    if stage not in ("prepare", "bert", "resnet", "clip", "all"):
        raise SystemExit(f"unknown stage: {stage}")


if __name__ == "__main__":
    main()
