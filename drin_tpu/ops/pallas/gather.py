# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused entity-row gather + int8 dequantization.

Reference data path: ``drin/data.py:85-126`` gathers candidate entity rows
from the global WikiMEL table per example on the host.  This repo moves the
tables into HBM and gathers inside the jitted step (data/device_store.py);
with ``quantize=True`` the XLA path is gather(int8) -> materialize ->
dequantize -> materialize bf16, which was MEASURED to cost +22% rank latency
at B=64 vs the bf16 store (BASELINE.md "int8 rank-stage entity tables"):
the dequant writes the full-size bf16 tensor on top of re-reading the
gathered int8, so net HBM traffic goes UP despite halved table reads.

This kernel fuses the whole path: row indices are scalar-prefetched, each
requested row is ONE async HBM->VMEM DMA out of a single PACKED int8 table
(all three entity feature tables concatenated per row, so one row = one
descriptor instead of three), the dequant multiply runs on the VPU over the
VMEM-resident block, and only the bf16 results are written.  Ideal traffic
per B=64/C=101 batch: ~40MB int8 read + ~73MB bf16 write vs the XLA int8
path's ~180MB and the bf16 store's ~146MB.

Row blocks are double-buffered: while block i is dequantized, block i+1's
row DMAs are already in flight.

Layout (learned the hard way on real Mosaic — interpret mode accepts
single-row slices of a 2D table, hardware does NOT: "slice shape along
dimension 0 must be aligned to tiling (8)"):

  * each packed row is stored as an ``(m, 128)`` int8 SLAB — ``m``
    sub-rows of 128 lanes, ``m`` padded to a multiple of 8 — so a per-row
    DMA slices only the UNTILED leading axis of the 3D ``[N, m, 128]``
    table and moves a whole tile-aligned region;
  * every dequant slot occupies a contiguous run of sub-rows (slot width
    must be a multiple of 128 — :func:`fused_gather_supported`), and its
    scale rides a per-sub-row ``[.., m, 1]`` COLUMN so the in-kernel
    broadcast never relayouts lanes into sublanes (CLAUDE.md Pallas notes);
  * outputs come back per chunk in ``(sub_rows, 128)`` geometry; the
    row-major reshape to ``(width,)`` happens OUTSIDE the kernel where it
    is a free contiguous bitcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 64  # divides the B=64 serving grids; scratch stays well <1MB
LANES = 128


def _slot_subrows(chunks):
    """Per-chunk (sub_lo, sub_hi) ranges and the padded slab height m."""
    spans, lo = [], 0
    for width, _ in chunks:  # slot counts only affect scale replication
        n = width // LANES
        spans.append((lo, lo + n))
        lo += n
    m = -(-lo // 8) * 8  # pad to the 8-sublane tile so slab layout == linear
    return tuple(spans), lo, m


def fused_gather_supported(d_packed: int, chunks) -> bool:
    """True when the packed layout lowers cleanly: every dequant slot is a
    whole number of 128-lane sub-rows (so slots sit on sub-row boundaries
    of the slab and the in-kernel slices stay lane-exact)."""
    if d_packed % LANES:
        return False
    for width, nslots in chunks:
        if width % nslots or (width // nslots) % LANES:
            return False
    return sum(w for w, _ in chunks) == d_packed


def _kernel(rows_ref, table_ref, scales_ref, *rest,
            spans, block_rows: int, out_dtype):
    n_out = len(spans)
    outs, (scratch, sems) = rest[:n_out], rest[n_out:]
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    G = block_rows

    def dma(buf, j, base):
        # [m, 128] tile-aligned slab per row: slices only untiled leading axes
        return pltpu.make_async_copy(
            table_ref.at[rows_ref[base + j]],
            scratch.at[buf, j],
            sems.at[buf, j],
        )

    def start_block(buf, base):
        def body(j, _):
            dma(buf, j, base).start()
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    @pl.when(i == 0)
    def _():  # prologue: the first block has nothing ahead of it
        start_block(0, 0)

    @pl.when(i + 1 < nsteps)
    def _():  # prefetch: next block's row DMAs fly during this block's math
        start_block((i + 1) % 2, (i + 1) * G)

    buf = i % 2

    def wait_body(j, _):
        dma(buf, j, i * G).wait()
        return 0

    jax.lax.fori_loop(0, G, wait_body, 0)

    # dequantize slot runs straight out of the scratch slab; same elementwise
    # ops as device_store._dequantize (int8 -> f32 multiply -> cast) so
    # results are bit-equal to the XLA path.  scales_ref is a [G, m, 1]
    # column: the broadcast runs along lanes, no relayout.
    for out, (lo, hi) in zip(outs, spans):
        q = scratch[buf, :, lo:hi, :].astype(jnp.float32)
        s = scales_ref[:, lo:hi, :].astype(jnp.float32)
        out[...] = (q * s).astype(out_dtype)


def gather_dequant(table, scales, rows, chunks, out_dtype,
                   block_rows: int = BLOCK_ROWS, interpret: bool = False):
    """Gather ``rows`` out of a packed int8 slab ``table`` and dequantize.

    Args:
      table: [N, m, 128] int8 — each row a slab of ``m`` 128-lane sub-rows
        (:func:`pack_quantized_tables`), chunks laid out contiguously in
        sub-row-major order, tail sub-rows zero pad.
      scales: [N, m] float32, one scale per (row, sub-row): every sub-row of
        a slot carries that slot's scale (pad sub-rows 1.0).
      rows: integer indices, any shape (flattened).  Out-of-range values
        degrade exactly like jnp indexing — negatives wrap once, the rest
        clamp (see Returns) — never an out-of-bounds HBM DMA.
      chunks: static tuple of (width, n_slots) per output — each output's
        width splits into n_slots contiguous runs sharing one scale each.
      out_dtype: compute dtype of the dequantized outputs.

    Returns a tuple of ``rows.shape + (width,)`` arrays, one per chunk,
    bit-equal to ``(chunk[rows].astype(f32) * scale).astype(out_dtype)``.
    """
    chunks = tuple((int(w), int(s)) for w, s in chunks)
    spans, m_data, m = _slot_subrows(chunks)
    N = table.shape[0]
    assert table.shape == (N, m, LANES), (table.shape, (N, m, LANES))
    assert scales.shape == (N, m), (scales.shape, (N, m))
    assert fused_gather_supported(m_data * LANES, chunks)
    shape = rows.shape
    if not jnp.issubdtype(jnp.asarray(rows).dtype, jnp.integer):
        # fail like jnp indexing does (table[rows] raises at trace time for
        # float/bool indexers); a silent astype would gather WRONG rows on
        # malformed serving input where every other store path fails loudly
        raise TypeError(
            f"gather_dequant rows must be integer, got {jnp.asarray(rows).dtype}")
    if int(np.prod(shape)) == 0:
        # R=0 (e.g. an empty candidate list): the XLA paths return empty
        # arrays; a zero-length grid would crash pallas_call
        return tuple(jnp.zeros(shape + (w,), jnp.dtype(out_dtype))
                     for w, _ in chunks)
    # Match jnp indexing semantics exactly (wrap negatives once, clamp the
    # rest): an out-of-range index must degrade to the same deterministic
    # row the XLA store paths gather, never an out-of-bounds HBM DMA (the
    # rows reach serving straight from network requests).
    flat = rows.reshape(-1).astype(jnp.int32)
    flat = jnp.clip(jnp.where(flat < 0, flat + N, flat), 0, N - 1)
    R = flat.shape[0]
    pad = (-R) % block_rows
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    Rp = R + pad

    # per-row scales are tiny ([R, m, 1] f32 columns); gather them with XLA
    # so the kernel's only dynamic addressing is the row DMAs
    sg = scales[flat][..., None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            # index maps receive (grid idx, *scalar-prefetch refs)
            pl.BlockSpec((block_rows, m, 1), lambda i, _rows: (i, 0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((block_rows, hi - lo, LANES),
                         lambda i, _rows: (i, 0, 0))
            for lo, hi in spans
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, m, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2, block_rows)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, spans=spans, block_rows=block_rows,
                          out_dtype=jnp.dtype(out_dtype)),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((Rp, hi - lo, LANES), jnp.dtype(out_dtype))
            for lo, hi in spans
        ),
        interpret=interpret,
    )(flat, table, sg)
    # (R, nsub, 128) -> (R, width) is a contiguous row-major bitcast
    return tuple(o[:R].reshape(shape + (w,))
                 for o, (w, _) in zip(outs, chunks))


def pack_quantized_tables(qtables, scales) -> tuple[np.ndarray, np.ndarray]:
    """Lay per-table int8 rows (flattened past axis 0) into ONE packed
    [N, m, 128] slab table + [N, m] per-sub-row scale matrix for
    :func:`gather_dequant`.

    ``scales[t]`` is [N] (one slot) or [N, S] (per-slot); every 128-lane
    sub-row of a slot inherits that slot's scale.  Pad sub-rows (slab
    height rounds up to the 8-sublane tile) hold zeros with scale 1.
    Chunk metadata is the caller's (it knows each table's true shape)."""
    n = qtables[0].shape[0]
    qs = [np.asarray(q).reshape(n, -1) for q in qtables]
    ss = [np.asarray(s).reshape(n, -1).astype(np.float32) for s in scales]
    chunks = tuple((q.shape[1], s.shape[1]) for q, s in zip(qs, ss))
    assert fused_gather_supported(sum(w for w, _ in chunks), chunks), (
        "fused_gather needs 128-lane-aligned feature slots; got chunk "
        f"layout {chunks} (use the XLA path for these dims)")
    spans, _, m = _slot_subrows(chunks)
    packed = np.zeros((n, m, LANES), np.int8)
    psc = np.ones((n, m), np.float32)
    for q, s, (lo, hi) in zip(qs, ss, spans):
        packed[:, lo:hi] = q.reshape(n, hi - lo, LANES)
        # each slot spans (width/nslots)/128 sub-rows, all carrying its scale
        psc[:, lo:hi] = np.repeat(s, (hi - lo) // s.shape[1], axis=1)
    return packed, psc
