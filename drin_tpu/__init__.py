# -*- coding: utf-8 -*-
"""drin-tpu: TPU-native multimodal entity linking (DRIN / GHMFC / MELHI).

Common entry points:

    from drin_tpu import make_config, get_model, create_datasets, Trainer
    from drin_tpu.serve import Ranker
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import drin_tpu` free of jax/flax cost
    if name == "make_config":
        from drin_tpu.common.config import make_config

        return make_config
    if name == "Config":
        from drin_tpu.common.config import Config

        return Config
    if name == "get_model":
        from drin_tpu.models import get_model

        return get_model
    if name == "create_datasets":
        from drin_tpu.data.dataset import create_datasets

        return create_datasets
    if name == "Trainer":
        from drin_tpu.train.trainer import Trainer

        return Trainer
    raise AttributeError(name)
