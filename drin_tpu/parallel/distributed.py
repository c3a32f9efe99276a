# -*- coding: utf-8 -*-
"""Multi-process (multi-host) SPMD support.

The reference is strictly single-process/single-GPU (``train.py:118`` pins
``devices=1``; SURVEY §2.11) — this is new capability.  The model follows
JAX's global-device semantics: one process per host joins a cluster via
``jax.distributed``, every process runs the SAME program over the SAME
global mesh, and each process feeds only the batch rows its addressable
devices own (``jax.make_array_from_process_local_data``).  Collectives ride
ICI within a slice and DCN across slices automatically.

Launch (one command per host)::

    python train.py mesh_data=8 mesh_model=2 \
        coordinator_address=host0:9876 num_processes=2 process_id=$RANK

Tested with a 2-process virtual-CPU cluster (tests/test_distributed.py) —
the JAX-idiomatic stand-in for a multi-host TPU pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def initialize(cfg=None, coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Join the multi-process cluster (idempotent; no-op for 1 process).

    Arguments default to the config's ``coordinator_address`` /
    ``num_processes`` / ``process_id`` knobs.  On TPU pods where the runtime
    provides cluster metadata, calling ``jax.distributed.initialize()`` with
    no arguments also works; this wrapper only adds the explicit-knob path
    and the single-process short-circuit."""
    if cfg is not None:
        coordinator_address = coordinator_address or (cfg.coordinator_address or None)
        num_processes = num_processes if num_processes is not None else cfg.num_processes
        process_id = process_id if process_id is not None else cfg.process_id
    if not num_processes or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shutdown() -> None:
    """Tear down the cluster connection (lets worker processes exit cleanly;
    the gloo/CPU transport otherwise lingers)."""
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def process_row_range(sharding, n_rows: int) -> tuple[int, int]:
    """The contiguous [start, stop) global batch-row range this process's
    addressable devices own under a batch sharding (leading dim sharded over
    the 'data' axis).  Raises if the process's rows are not contiguous —
    the mesh should be built so each host's devices are adjacent along
    'data' (the default ``jax.devices()`` order guarantees this)."""
    slices = sharding.addressable_devices_indices_map((n_rows,)).values()
    spans = sorted({((s[0].start or 0), (s[0].stop if s[0].stop is not None else n_rows))
                    for s in slices})
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise ValueError(
            f"process {jax.process_index()} owns non-contiguous batch rows {spans}; "
            "build the mesh with hosts adjacent along the 'data' axis")
    return lo, hi


def put_global_batch(local_batch: Sequence, shardings: Sequence,
                     global_batch_size: int) -> tuple:
    """Assemble global device arrays from this process's local batch rows.

    ``local_batch`` holds only the rows returned by :func:`process_row_range`;
    every process must call this with the same global shapes (SPMD)."""
    out = []
    for x, sh in zip(local_batch, shardings):
        x = np.asarray(x)
        gshape = (global_batch_size,) + x.shape[1:]
        out.append(jax.make_array_from_process_local_data(sh, x, gshape))
    return tuple(out)
