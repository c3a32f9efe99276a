# -*- coding: utf-8 -*-
"""Offline preprocessing pipeline: raw data -> .npy feature store.

Four stages mirroring the reference CLI sequence (readme.md:109-114):

  python -m drin_tpu.preprocess prepare   # raw JSON/TSV -> intermediate
  python -m drin_tpu.preprocess bert      # frozen BERT text features
  python -m drin_tpu.preprocess resnet    # frozen ResNet image/object features
  python -m drin_tpu.preprocess clip      # frozen CLIP cross-modal similarities
"""
