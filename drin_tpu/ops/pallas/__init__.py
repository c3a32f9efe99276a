# -*- coding: utf-8 -*-
"""Pallas TPU kernels (einsum/XLA fallbacks kept alongside each kernel)."""

from drin_tpu.ops.pallas.gcn import fused_vertex_update, vertex_update_reference  # noqa: F401
from drin_tpu.ops.pallas.gcn_layer import (  # noqa: F401
    fused_gcn_layer,
    fused_gcn_layer_ad,
    gcn_layer_reference,
)
from drin_tpu.ops.pallas.attention import (  # noqa: F401
    attention_reference,
    fused_attention,
)
