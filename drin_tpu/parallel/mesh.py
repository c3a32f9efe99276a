# -*- coding: utf-8 -*-
"""Device mesh construction and sharding layouts.

The reference is single-GPU (``train.py:118`` pins ``devices=1``); this module
is new capability (SURVEY §2.11).  The parallelism plan follows the workload's
natural axes:

  * ``data``  — batch (mention) axis: pure data parallelism.
  * ``model`` — candidate axis: the reference's scaling lever is candidate
    packing (SURVEY §5.7); on TPU we shard the C(=101) candidate dimension of
    all entity-side tensors so each chip scores a slice of the candidates.
    XLA/GSPMD inserts the all-gathers/psums needed by the cross-candidate
    reductions (cosine softmax-free scoring, topk, in-batch-negative loss).

Collectives ride ICI within a slice; across slices JAX's global-device
runtime uses DCN automatically (standard jax.distributed semantics).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from drin_tpu.common.config import Config

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[Config] = None, devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: Optional[int] = None) -> Mesh:
    """Build a (data, model) mesh.

    Sizes come from ``cfg.mesh_data`` / ``cfg.mesh_model`` (or the explicit
    ``data``/``model`` args).  ``data = -1`` means "all remaining devices"."""
    if devices is None:
        devices = jax.devices()
    nd = data if data is not None else (cfg.mesh_data if cfg else -1)
    nm = model if model is not None else (cfg.mesh_model if cfg else 1)
    if nd == -1:
        nd = len(devices) // nm
    if nd * nm < len(devices):
        # loud, like make_hybrid_mesh: a non-dividing mesh_model silently
        # idling chips is invisible on the divisible virtual test meshes
        import sys

        print(f"make_mesh: using {nd * nm} of {len(devices)} devices "
              f"({len(devices) - nd * nm} idle — data={nd} x model={nm} "
              "does not cover the pod)", file=sys.stderr, flush=True)
    devices = np.asarray(devices[: nd * nm]).reshape(nd, nm)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def group_by_slice(devices: Optional[Sequence[jax.Device]] = None) -> list:
    """Group devices by TPU slice (``slice_index``; one group on platforms
    without slices).  Preserves device order within each group."""
    if devices is None:
        devices = jax.devices()
    groups: dict = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", 0), []).append(d)
    return [groups[k] for k in sorted(groups)]


def make_hybrid_mesh(slices: Optional[Sequence[Sequence[jax.Device]]] = None,
                     model: int = 1, data: Optional[int] = None) -> Mesh:
    """(data, model) mesh for multi-slice pods: the ``model`` axis (candidate
    sharding — latency-critical all-gather/reduce-scatter per step) is laid
    out WITHIN a slice so its collectives ride ICI; the ``data`` axis spans
    slices, so only the DP gradient/metric psums cross DCN.

    ``slices`` defaults to :func:`group_by_slice` over all devices.  A
    rectangular mesh needs a uniform per-slice contribution: every slice
    contributes the same ``min(len(slice)) // model * model`` devices (or
    ``data // n_slices`` rows when an explicit total ``data`` width is
    given); devices beyond that are left out with a warning."""
    if slices is None:
        slices = group_by_slice()
    smallest = min(len(s) for s in slices)
    if data is not None:
        assert data % len(slices) == 0, (
            f"data={data} must divide over {len(slices)} slices")
        rows = data // len(slices)
        assert rows * model <= smallest, (
            f"data={data} x model={model} needs {rows * model} devices/slice; "
            f"smallest slice has {smallest}")
    else:
        rows = smallest // model
    per = rows * model
    assert per >= model, f"each slice must hold >= model={model} devices (smallest: {smallest})"
    total = sum(len(s) for s in slices)
    dropped = total - per * len(slices)
    if dropped:
        # multi-host launchers routinely swallow warnings.warn, so capacity
        # loss must be loud: print on the main process and refuse outright
        # when an explicit layout would idle most of the pod
        msg = (f"hybrid mesh uses {per} devices per slice; {dropped}/{total} "
               f"device(s) left out of the mesh")
        # an explicit data width is a deliberate request for a smaller mesh
        # (warn only); an implicit one dropping half the pod means the slice
        # sizes don't fit the layout at all — refuse rather than idle capacity
        if data is None and dropped * 2 >= total:
            raise ValueError(msg + " — over half the pod would sit idle; fix "
                             "mesh_data/mesh_model to match the slice sizes")
        import sys
        import warnings

        warnings.warn(msg)
        if jax.process_index() == 0:
            print(f"WARNING: {msg}", file=sys.stderr, flush=True)
    blocks = [np.asarray(s[:per], dtype=object).reshape(rows, model)
              for s in slices]
    devices = np.concatenate(blocks, axis=0)  # [n_slices * rows, model]
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_specs(mesh: Mesh, batch_fields: Sequence[str], example_batch: Sequence) -> tuple:
    """PartitionSpecs for a DRIN/baseline batch tuple.

    Every tensor shards its batch dim over ``data``.  The heavy entity-side
    tensors ([B, C, ...], ndim >= 3) additionally shard the candidate dim
    over ``model`` when C divides the mesh axis — the TPU analogue of the
    reference's candidate-packing lever (SURVEY §5.7).  Small per-candidate
    vectors (edges, answer one-hots) stay replicated along ``model``; GSPMD
    inserts the reshards where the model mixes them."""
    nm = mesh.shape[MODEL_AXIS]
    specs = []
    for name, arr in zip(batch_fields, example_batch):
        arr = np.asarray(arr)
        if (
            name.startswith("entity_")
            and arr.ndim >= 3
            and nm > 1
            and arr.shape[1] % nm == 0
        ):
            specs.append(P(DATA_AXIS, MODEL_AXIS))
        elif arr.ndim >= 1:
            specs.append(P(DATA_AXIS))
        else:
            specs.append(P())
    return tuple(specs)


def batch_shardings(mesh: Mesh, batch_fields: Sequence[str], example_batch: Sequence) -> tuple:
    return tuple(NamedSharding(mesh, s) for s in batch_specs(mesh, batch_fields, example_batch))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(batch, shardings) -> tuple:
    """Device-put a host batch tuple under the given shardings (one transfer
    per field; fields land already laid out for the mesh)."""
    return tuple(jax.device_put(np.asarray(x), s) for x, s in zip(batch, shardings))


def padded_candidate_count(C: int, nm: int) -> int:
    """Smallest multiple of the model-axis size >= C (C itself when it
    already divides)."""
    return ((C + nm - 1) // nm) * nm


def pad_candidates_to(batch, batch_fields: Sequence[str], c_from: int, c_to: int):
    """Pad the candidate dim (axis 1) of every candidate-carrying field from
    ``c_from`` to ``c_to`` with zeros (row indices pad with 0 — a valid row;
    its contributions are masked inside the model).

    This is what lets WikiMEL's prime C=101 shard over the ``model`` axis:
    the models mask the fake candidates at every cross-candidate reduction
    and slice scores back to C (models/drin.py GCNLayer + score slice), so
    the padded run is exactly equal to the unpadded one."""
    if c_to == c_from:
        return batch
    out = []
    for name, x in zip(batch_fields, batch):
        x = np.asarray(x)
        if (name.startswith("entity_") or name.endswith("_similarity")) and x.ndim >= 2 \
                and x.shape[1] == c_from and name != "answer":
            pad = np.zeros((x.shape[0], c_to - c_from) + x.shape[2:], x.dtype)
            x = np.concatenate([x, pad], axis=1)
        out.append(x)
    return tuple(out) if type(batch) is tuple else type(batch)(*out)


def pad_batch_to(batch, n: int):
    """Pad every field's leading dim to ``n`` rows by repeating row 0 and
    return (padded_batch, valid_mask[n]).  Keeps shapes static for jit when
    the last batch of an epoch is ragged."""
    b = len(batch[0])
    valid = np.zeros((n,), np.float32)
    valid[:b] = 1.0
    if b == n:
        return batch, valid
    out = []
    for x in batch:
        x = np.asarray(x)
        pad = np.broadcast_to(x[:1], (n - b,) + x.shape[1:])
        out.append(np.concatenate([x, pad], axis=0))
    return type(batch)(*out), valid
