# -*- coding: utf-8 -*-
"""Preprocessing CLI: ``python -m drin_tpu.preprocess <stage> [key=value ...]``.

Stages: prepare, bert, resnet, clip, all.  Config overrides work like
train.py (e.g. ``dataset_name=wikimel bert_checkpoint=/path/sd.pt``).

Migrating a store the reference already preprocessed (with its pretrained
torchvision detector): ``resnet import_objects_from=/path/to/ref/store``
adopts the detector-derived object arrays verbatim — zero object-feature
drift — while whole-image features are recomputed here.

One entry replaces the reference's four separate ``__main__`` scripts
(prepare.py:200-207, bert.py:111-118, resnet.py:164-171, clip.py:171-178),
which are run by editing ``common/args.py`` first (readme.md:116)."""

from __future__ import annotations

import sys

STAGES = ("prepare", "bert", "resnet", "clip", "all")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit(__doc__)
    stage, rest = argv[0], argv[1:]
    if stage not in STAGES:
        # validate BEFORE building the config: a stage typo must not be
        # masked by (or wait behind) override/config errors
        raise SystemExit(f"unknown stage: {stage} (expected one of {STAGES})")

    from drin_tpu.common.cli import parse_overrides
    from drin_tpu.common.config import make_config

    overrides = parse_overrides(rest)
    model_type = overrides.pop("model_type", "drin")
    dataset_name = overrides.pop("dataset_name", "wikidiverse")
    cfg = make_config(model_type, dataset_name, **overrides)

    if stage in ("prepare", "all"):
        from drin_tpu.preprocess.prepare import run_prepare

        run_prepare(cfg)

    mesh = None
    if stage != "prepare" and cfg.preprocess_data_parallel:
        import jax

        if len(jax.devices()) > 1:  # shard encoder batches over local chips
            mesh = jax.devices()

    if stage in ("bert", "all"):
        from drin_tpu.preprocess.stages import BertStage

        BertStage(cfg, mesh=mesh).run()
    if stage in ("resnet", "all"):
        from drin_tpu.preprocess.stages import ResnetStage

        ResnetStage(cfg, mesh=mesh).run()
    if stage in ("clip", "all"):
        from drin_tpu.preprocess.stages import ClipStage

        ClipStage(cfg, mesh=mesh).run()


if __name__ == "__main__":
    main()
