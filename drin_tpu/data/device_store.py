# -*- coding: utf-8 -*-
"""Device-resident entity tables: HBM embedding store + in-step gather.

The reference gathers candidate rows from the 100GB-class host feature store
inside DataLoader workers and ships ~90MB of entity features to the device
per batch (drin/data.py:85-126, SURVEY §3.3 — its input bottleneck).  With
the pooled entity cache the global WikiMEL tables shrink to ~350MB (bf16),
which fits TPU HBM; this module uploads them once and rewrites the step's
feature tuple so batches carry only a [B, C] int32 row-index matrix — the
gather runs on-device as part of the jitted step.

Two mesh layouts:

  * **replicated** (default for the pooled ~350MB case): every device holds
    the full tables; the per-batch gather is a local HBM lookup.
  * **row-sharded** (``shard_rows=True``): the row axis is split over the
    ``model`` mesh axis, so the non-pooled token-level WikiMEL table (~20GB
    f32, SURVEY §7 hard-part 3) fits at 20GB/n_model per chip.  The in-step
    gather resolves each requested row to its owning shard: every rank
    looks up the rows it owns (zeros elsewhere) and one reduce-scatter
    (``psum_scatter`` over the candidate dim when C divides the axis, else a
    ``psum``) assembles the batch — the activations ride ICI, the table
    never moves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drin_tpu.common.config import Config
from drin_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class DrinRowsBatch(NamedTuple):
    """DRIN batch with the entity side replaced by table row indices."""

    mention_text_feature: np.ndarray
    mention_text_mask: np.ndarray
    mention_start_pos: np.ndarray
    mention_end_pos: np.ndarray
    mention_image_feature: np.ndarray
    mention_object_feature: np.ndarray
    mention_object_score: np.ndarray
    entity_rows: np.ndarray  # [B, C] int32
    miet_similarity: np.ndarray
    mtei_similarity: np.ndarray
    answer: np.ndarray


class BaselineRowsBatch(NamedTuple):
    mention_text_feature: np.ndarray
    mention_text_mask: np.ndarray
    mention_start_pos: np.ndarray
    mention_end_pos: np.ndarray
    mention_image_feature: np.ndarray
    entity_rows: np.ndarray  # [B, C] int32
    answer: np.ndarray


def include_for(kind: str) -> tuple:
    """The entity tables a model KIND reads from its device store — the ONE
    definition serving (serve.Ranker) and training (train.py) share so the
    two can never build different layouts for the same model.  DRIN reads
    all three (drin.py entity tower); GHMFC — the only baseline that
    reaches a wikimel device store — reads ONLY the text table (reference
    ghmfc.py:202-251: no entity-image and no object branch; MELHI reads
    entity images but is wikidiverse-only and never gets a store)."""
    return ("text", "image", "obj") if kind == "drin" else ("text",)


def quantize_entity_rows(x: np.ndarray, per_slot: bool = False):
    """Per-entity max-abs int8 quantization of an [N, ...] table: one f32
    scale per row over ALL of the row's elements (same scheme as the
    retrieval cache, serve.quantize_rows, at entity granularity).

    ``per_slot=True`` (for [N, S, ...] tables whose second-axis slots hold
    differently-scaled quantities — the pooled text table's projected slot 0
    vs raw-CLS slot 1) uses one scale per (row, slot) instead, scale shape
    [N, S], so a magnitude mismatch between slots cannot inflate the smaller
    slot's quantization error (ADVICE r4; the dequant machinery broadcasts
    arbitrary leading scale dims).

    Returns ``(q, scale)`` with ``q`` int8 shaped like ``x`` and ``scale``
    float32 [N] (or [N, S]) such that ``q * scale ~= x`` (element error
    bounded by ``max|row| / 254``).  Zero rows get scale 1 so they
    dequantize to zero."""
    x = np.asarray(x)
    lead = 2 if per_slot else 1
    assert x.ndim > lead, (x.shape, per_slot)
    flat = x.reshape(x.shape[:lead] + (-1,)).astype(np.float32)
    s = np.max(np.abs(flat), axis=-1)
    s = np.where(s == 0, np.float32(1.0), s)
    q = np.clip(np.round(flat / s[..., None] * 127.0), -127, 127).astype(np.int8)
    return q.reshape(x.shape), (s / 127.0).astype(np.float32)


def _dequantize(q: jax.Array, scale: jax.Array, dt) -> jax.Array:
    """int8 rows + per-row scale -> compute-dtype rows (dequantize in f32,
    then cast, so the scale multiply doesn't round twice)."""
    s = scale.reshape(scale.shape + (1,) * (q.ndim - scale.ndim))
    return (q.astype(jnp.float32) * s).astype(dt)


def _owner_gather(table: jax.Array, rows: jax.Array, axis: str) -> jax.Array:
    """Per-rank piece of the sharded-table gather (runs inside shard_map).

    ``table`` is this rank's [N/n, ...] row block; each rank resolves which
    requested rows it owns, gathers those locally and contributes exact
    zeros for the rest, so the cross-rank sum reconstructs the full gather
    bit-for-bit (exactly one nonzero term per element)."""
    nl = table.shape[0]
    me = jax.lax.axis_index(axis)
    owner = rows // nl
    mine = owner == me
    vals = table[jnp.where(mine, rows - owner * nl, 0)]
    keep = mine.reshape(rows.shape + (1,) * (vals.ndim - rows.ndim))
    return jnp.where(keep, vals, jnp.zeros((), vals.dtype))


def _make_sharded_gather(mesh, n_tables: int, C: int):
    """shard_map'd multi-table gather: tables row-sharded over ``model``,
    rows sharded over ``data``.  When the candidate dim divides the model
    axis the combine is a reduce-scatter over C (each rank keeps its C/n
    slice — half the ICI traffic of a psum and the output lands already
    laid out like ``parallel.mesh.batch_specs``); otherwise a psum leaves
    the gathered tensors replicated along ``model``."""
    from jax.sharding import PartitionSpec as P

    nm = mesh.shape[MODEL_AXIS]
    scatter = nm > 1 and C % nm == 0
    out_spec = P(DATA_AXIS, MODEL_AXIS) if scatter else P(DATA_AXIS)

    def fn(*args):
        *tbls, rows = args
        outs = []
        for t in tbls:
            v = _owner_gather(t, rows, MODEL_AXIS)
            if scatter:
                v = jax.lax.psum_scatter(v, MODEL_AXIS, scatter_dimension=1, tiled=True)
            else:
                v = jax.lax.psum(v, MODEL_AXIS)
            outs.append(v)
        return tuple(outs)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple(P(MODEL_AXIS) for _ in range(n_tables)) + (P(DATA_AXIS),),
        out_specs=tuple(out_spec for _ in range(n_tables)),
    )


class DeviceEntityStore:
    """Upload the global entity tables once; build a ``feats_fn`` that
    reconstructs the model's full feature tuple inside jit.

    ``shard_rows=True`` (requires ``mesh``) splits every table's row axis
    over the ``model`` mesh axis and gathers collectively in-step; this is
    what makes the non-pooled token-level table usable (it exceeds a single
    chip's HBM).  Default is full replication (pooled tables are small).

    ``quantize=True`` stores the three feature tables as int8 with one f32
    max-abs scale per entity (:func:`quantize_entity_rows`) — half the
    resident bytes of bf16, a quarter of f32, so roughly 2x the servable
    entities per chip.  The in-step gather dequantizes the [B, C] gathered
    rows to the compute dtype right after the lookup, so per-batch compute
    is unchanged.  Scores are TOLERANCE-BOUNDED, not exact: the rank
    forward is nonlinear, so no exact rescore from int8 exists (unlike the
    retrieval cache's exact shortlist rescore) — per-element table error is
    <= max|row|/254, comparable to the bf16 rounding the serving path
    already accepts (machinery-exactness and score-divergence tests:
    tests/test_device_store.py).

    ``include`` names the feature tables the consumer's model actually
    reads.  GHMFC's entity tower reads ONLY the text table (reference
    ghmfc.py:202-251 — no entity-image and no object branch; MELHI reads
    entity images but is wikidiverse-only and never gets a device store),
    so ``include=("text",)`` skips uploading the image AND object tables:
    at the WikiMEL serving scale that is ~900MB bf16 (~450MB int8) of HBM
    the model would never touch — the capacity headroom quantize exists
    for.  DRIN requires the full default."""

    def __init__(self, cfg: Config, tables: dict, dtype=None, sharding=None,
                 mesh=None, shard_rows: bool = False, quantize: bool = False,
                 fused_gather: bool = False,
                 include: tuple = ("text", "image", "obj")):
        assert cfg.entity_pooling_cached or shard_rows, (
            "non-pooled token-level tables exceed one chip's HBM; use "
            "shard_rows=True on a mesh (or enable the pooled entity cache)")
        self.pooled = cfg.entity_pooling_cached
        self.sharded = shard_rows
        self.quantized = bool(quantize)
        self.mesh = mesh
        assert {"text"} <= set(include) <= {"text", "image", "obj"}, (
            "include must keep the text table (stage-1 retrieval scans it) "
            f"— got {include}")
        # canonical order so the fused slab layout / _tables() are stable
        self.include = tuple(n for n in ("text", "image", "obj")
                             if n in include)
        dt = jnp.dtype(dtype or cfg.compute_dtype)
        self.dtype = dt
        if shard_rows:
            assert mesh is not None, "shard_rows needs the device mesh"
            from jax.sharding import NamedSharding, PartitionSpec as P

            nm = mesh.shape[MODEL_AXIS]
            sharding = NamedSharding(mesh, P(MODEL_AXIS))

            def put(x, cast=True):
                x = np.asarray(x)
                if x.shape[0] % nm:  # pad rows so the shard split is even;
                    # indices never address the padding (rows < N)
                    pad = nm - x.shape[0] % nm
                    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                if cast and np.issubdtype(x.dtype, np.floating):
                    x = x.astype(dt)
                return jax.device_put(x, sharding)
        else:
            def put(x, cast=True):
                x = np.asarray(x)
                if cast and np.issubdtype(x.dtype, np.floating):
                    x = x.astype(dt)
                return jax.device_put(jnp.asarray(x), sharding)

        # unpadded entity count: shard_rows pads the row axis to the mesh
        # multiple, and consumers that scan WHOLE tables (serving retrieval,
        # /stats) must not see the zero pad rows — only the in-step gather
        # (rows < N by construction) may ignore the distinction
        self.n_rows = int(np.asarray(tables["entity_text_feature"]).shape[0])
        self.fused = bool(fused_gather)
        self.packed = self.packed_scales = None
        if self.fused:
            # Serve the int8 tables through the Pallas gather+dequant kernel
            # (ops/pallas/gather.py): one tile-aligned DMA per entity row,
            # dequant in VMEM, only bf16 written.  Costs the slab pad —
            # sub-rows round up to the 8-sublane tile (44 -> 48 = +9%
            # resident/read bytes at the reference 768/2048 dims).
            from drin_tpu.ops.pallas.gather import (fused_gather_supported,
                                                    pack_quantized_tables)

            assert quantize and self.pooled and not shard_rows, (
                "fused_gather fuses the int8 gather+dequant kernel: it "
                "requires quantize=True, the pooled entity cache, and a "
                "replicated (non-row-sharded) store")
            # ONE packed int8 [m, 128] slab per entity (text ‖ image ‖ obj
            # for DRIN; text ‖ image for baseline stores that exclude the
            # object table) so the kernel's gather is one tile-aligned DMA
            # per row; per-table attrs stay None (a second per-table copy
            # would erase the capacity win) and float_rows/float_table
            # slice sub-row spans out of the packed slab
            keys = {"text": "entity_text_feature",
                    "image": "entity_image_feature",
                    "obj": "entity_object_feature"}
            # per-slot scales only for the pooled text table's (projected,
            # raw-CLS) slot pair (ADVICE r4)
            qs = [quantize_entity_rows(np.asarray(tables[keys[n]]),
                                       per_slot=n == "text")
                  for n in self.include]
            tails = tuple(np.asarray(tables[keys[n]]).shape[1:]
                          for n in self.include)
            # n_slots per chunk comes from the scale shape: [N, S] per-slot
            # scales -> S slots, [N] per-row scales -> 1 slot
            chunks = tuple((int(np.prod(t)), int(np.prod(s.shape[1:])))
                           for t, (_, s) in zip(tails, qs))
            assert fused_gather_supported(sum(w for w, _ in chunks), chunks), (
                "fused_gather needs 128-lane-aligned feature slots; "
                f"got widths {[c[0] for c in chunks]} "
                "(use the XLA path for these dims)", chunks)
            packed, psc = pack_quantized_tables([q for q, _ in qs],
                                                [s for _, s in qs])
            self._chunks, self._tails = chunks, tails
            subs = np.cumsum([0] + [w // 128 for w, _ in chunks])
            self._layout = {name: (int(subs[i]), int(subs[i + 1]),
                                   chunks[i][1], tails[i])
                            for i, name in enumerate(self.include)}
            self.packed = put(packed)
            self.packed_scales = put(psc, cast=False)
            self.text = self.image = self.obj = None
            self.text_scale = self.image_scale = self.obj_scale = None
        elif quantize:
            def put_q(x, per_slot=False):
                q, s = quantize_entity_rows(x, per_slot=per_slot)
                # scales stay f32 (cast=False): a bf16 scale would round the
                # dequantized rows a second time
                return put(q), put(s, cast=False)

            # pooled text rows hold (projected, raw-CLS) slots whose
            # magnitudes diverge after precompute_entity_projection — scale
            # them independently ([N, 2] scales) so the retrieval-feeding
            # CLS slot doesn't inherit the projected slot's range (ADVICE r4)
            self.text, self.text_scale = put_q(tables["entity_text_feature"],
                                               per_slot=self.pooled)
            self.image, self.image_scale = (
                put_q(tables["entity_image_feature"])
                if "image" in self.include else (None, None))
            self.obj, self.obj_scale = (
                put_q(tables["entity_object_feature"])
                if "obj" in self.include else (None, None))
        else:
            self.text_scale = self.image_scale = self.obj_scale = None
            self.text = put(tables["entity_text_feature"])  # [N, 2, D] pooled / [N, Le, D]
            self.image = (put(tables["entity_image_feature"])  # [N, 1, Dr]
                          if "image" in self.include else None)
            self.obj = (put(tables["entity_object_feature"])  # [N, Te, 1, Dr]
                        if "obj" in self.include else None)
        self.text_mask = None if self.pooled else put(tables["entity_text_mask"])  # [N, Le]
        self.obj_score = (put(tables["entity_object_score"])  # [N, Te] (tiny; kept float)
                          if "obj" in self.include else None)
        self.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                          for t in self._tables())

    def _tables(self):
        if self.fused:
            ts = [self.packed, self.packed_scales, self.obj_score]
        elif self.quantized:
            ts = [self.text, self.text_scale]
            if self.text_mask is not None:
                ts.append(self.text_mask)
            ts += [self.image, self.image_scale, self.obj, self.obj_scale,
                   self.obj_score]
        else:
            ts = [self.text, self.image, self.obj, self.obj_score]
            if self.text_mask is not None:
                ts.insert(1, self.text_mask)
        # an include-narrowed store (baseline: no object tables) leaves the
        # excluded attrs None; drop them so consumers see a dense tuple
        return tuple(t for t in ts if t is not None)

    def _qview(self, name: str, lo: int, hi: int):
        """Quantized ``(rows, scales)`` for ``table[lo:hi]`` in the same
        shapes the per-table layout stores — on a fused store these are
        sub-row-span slices of the packed slab (transient is the slice,
        never a per-table copy)."""
        assert name in self.include, (
            f"store was built without the {name!r} table (include="
            f"{self.include})")
        if not self.fused:
            return getattr(self, name)[lo:hi], getattr(self, f"{name}_scale")[lo:hi]
        s0, s1, nslots, tail = self._layout[name]
        # clamp like a python slice would: chunked consumers pass hi past
        # the table end on their last chunk
        hi = min(hi, self.packed.shape[0])
        q = self.packed[lo:hi, s0:s1].reshape((hi - lo,) + tail)
        # every sub-row of a slot repeats that slot's scale: stride one out
        ss = self.packed_scales[lo:hi, s0:s1:(s1 - s0) // nslots]
        return q, (ss if nslots > 1 else ss[:, 0])

    def float_table(self, name: str, chunk: int = 32768):
        """Float view of ``'text'`` / ``'image'`` / ``'obj'`` for WHOLE-table
        consumers (retrieval source, GHMFC entity precompute, save_bundle):
        a quantized store dequantizes in ``chunk``-row pieces written into
        one preallocated (donated) output buffer, so peak transient HBM is
        one chunk's intermediates — not a whole-table f32 copy, which on a
        chip deliberately packed to int8 capacity (~2x entities) would OOM
        exactly the deployments quantize targets (ADVICE r4).  Non-quantized
        stores return the resident table unchanged.

        On a ROW-SHARDED quantized store the chunked path accumulates on
        the HOST and returns a numpy array: a device output buffer would
        have to live unsharded on one chip (``jnp.zeros`` ignores the
        source table's sharding), re-creating the very single-device
        whole-table copy the sharding exists to avoid.  Whole-table
        consumers are host-bound by design (``save_bundle``); device
        consumers of sharded stores must use :meth:`float_rows` slices."""
        assert name in self.include, (
            f"store was built without the {name!r} table (include="
            f"{self.include})")
        if not self.quantized:
            return getattr(self, name)
        n = (self.packed if self.fused else getattr(self, name)).shape[0]
        deq = jax.jit(_dequantize, static_argnums=2)
        if n <= chunk:
            return deq(*self._qview(name, 0, n), self.dtype)
        if self.sharded:
            # host accumulation: the device transient is one chunk's
            # dequant; a device output buffer would sit unsharded on one
            # chip (see docstring)
            pieces = [np.asarray(deq(*self._qview(name, lo, min(lo + chunk, n)),
                                     self.dtype))
                      for lo in range(0, n, chunk)]
            return np.concatenate(pieces)
        write = jax.jit(
            lambda out, piece, lo: jax.lax.dynamic_update_slice(
                out, piece, (lo,) + (0,) * (out.ndim - 1)),
            donate_argnums=0)
        shape = (n,) + self._layout[name][3] if self.fused else getattr(self, name).shape
        out = jnp.zeros(shape, self.dtype)
        for lo in range(0, n, chunk):
            out = write(out, deq(*self._qview(name, lo, min(lo + chunk, n)),
                                 self.dtype), jnp.int32(lo))
        return out

    def float_rows(self, name: str, lo: int, hi: int, slot=None):
        """Dequantized ``table[lo:hi]`` rows (optionally one second-axis
        ``slot``) — for consumers that only need a slice (chunked GHMFC
        entity precompute, the retrieval source's single text slot): the
        transient is the slice, never the table."""
        assert name in self.include, (
            f"store was built without the {name!r} table (include="
            f"{self.include})")
        if not self.quantized:
            q = getattr(self, name)
            return q[lo:hi] if slot is None else q[lo:hi, slot]
        qs, ss = self._qview(name, lo, hi)
        if slot is not None:
            qs = qs[:, slot]
            if ss.ndim > 1:  # per-slot scales [N, S]
                ss = ss[:, slot]
        return jax.jit(_dequantize, static_argnums=2)(qs, ss, self.dtype)

    def _gather_fn(self, n_tables: int, C: int):
        """(tables..., rows [B, C]) -> gathered [B, C, ...] per table."""
        if not self.sharded:
            return lambda *args: tuple(t[args[-1]] for t in args[:-1])
        return _make_sharded_gather(self.mesh, n_tables, C)

    def drin_feats_fn(self):
        """The returned ``feats_fn`` carries its device tables on the
        ``.tables`` attribute; the step builders (train/trainer.py,
        serve.py) pass them through the jit boundary as ARGUMENTS each
        call.  Closing over them instead would bake the (possibly
        multi-GB) tables into the lowered program as constants — measured
        to hang compilation at the real WikiMEL table size."""
        assert {"image", "obj"} <= set(self.include), (
            "DRIN reads the entity image AND object tables; this store was "
            f"built with include={self.include} (a baseline layout)")
        default_tables = self._tables()
        gathers: dict = {}  # keyed by candidate count (scatter layout depends on C)
        dt = self.dtype
        if self.fused:
            from drin_tpu.ops.pallas.gather import gather_dequant

            chunks, tails = self._chunks, self._tails
            # interpret mode lets the CPU-mesh test suite execute the kernel;
            # decided at trace time, static for the lowered program
            interp = jax.default_backend() != "tpu"

            def feats_fn(feats, tables=default_tables):
                (mtf, mtm, sp, ep, mif, mof, mos, rows, miet, mtei) = feats
                packed, psc, eos_t = tables
                tf, imf, of = gather_dequant(packed, psc, rows, chunks, dt,
                                             interpret=interp)
                etf = tf.reshape(rows.shape + tails[0])
                eif = imf.reshape(rows.shape + tails[1])
                eof = of.reshape(rows.shape + tails[2])
                eos = eos_t[rows]
                etm = jnp.zeros((rows.shape[0],), jnp.int32)
                return (mtf, mtm, sp, ep, mif, mof, mos,
                        etf, etm, eif, eof, eos, miet, mtei)

            feats_fn.tables = default_tables
            return feats_fn

        def feats_fn(feats, tables=default_tables):
            (mtf, mtm, sp, ep, mif, mof, mos, rows, miet, mtei) = feats
            C = rows.shape[1]
            if C not in gathers:
                gathers[C] = self._gather_fn(len(tables), C)
            got = gathers[C](*tables, rows)
            if self.quantized:
                # dequantize the gathered [B, C] rows (not the whole table)
                if self.pooled:
                    tq, tsc, iq, isc, oq, osc, eos = got
                    etm = jnp.zeros((rows.shape[0],), jnp.int32)
                else:
                    tq, tsc, etm, iq, isc, oq, osc, eos = got
                etf = _dequantize(tq, tsc, dt)
                eif = _dequantize(iq, isc, dt)
                eof = _dequantize(oq, osc, dt)
            elif self.pooled:
                etf, eif, eof, eos = got
                etm = jnp.zeros((rows.shape[0],), jnp.int32)  # consumed at pooling
            else:
                etf, etm, eif, eof, eos = got
            return (mtf, mtm, sp, ep, mif, mof, mos,
                    etf, etm, eif, eof, eos, miet, mtei)

        feats_fn.tables = default_tables
        return feats_fn

    def baseline_feats_fn(self):
        """See :meth:`drin_feats_fn` for the ``.tables`` pass-as-argument
        contract.

        GHMFC's entity tower reads ONLY the text table (reference
        ghmfc.py:202-251 — no entity-image branch; MELHI reads entity
        images but is wikidiverse-only and never gets a device store), so
        an ``include=("text",)`` store skips uploading the image table
        entirely and the model's unused ``entity_image`` slot is a zeros
        placeholder."""
        dt = self.dtype
        has_img = "image" in self.include

        def placeholder_eif(rows):
            # the model never reads this slot; [B, C, 1] keeps the tuple
            # shape contract without resident or gathered image bytes
            return jnp.zeros(rows.shape + (1,), dt)

        if self.fused:
            from drin_tpu.ops.pallas.gather import gather_dequant

            assert self.include in (("text",), ("text", "image")), (
                "a fused baseline store must pack exactly the text(+image) "
                f"layout (include={self.include}): gathering a slab that "
                "also carries the DRIN object chunk would read dead bytes "
                "per row — rebuild with include=('text',) or "
                "('text', 'image')")
            default_tables = (self.packed, self.packed_scales)
            chunks, tails = self._chunks, self._tails
            interp = jax.default_backend() != "tpu"

            def feats_fn(feats, tables=default_tables):
                (mtf, mtm, sp, ep, mif, rows) = feats
                packed, psc = tables
                got = gather_dequant(packed, psc, rows, chunks, dt,
                                     interpret=interp)
                etf = got[0].reshape(rows.shape + tails[0])
                eif = (got[1].reshape(rows.shape + tails[1]) if has_img
                       else placeholder_eif(rows))
                etm = jnp.zeros((rows.shape[0],), jnp.int32)
                if eif.ndim == 4:  # [B, C, 1, Dr] pooler rows -> [B, C, Dr]
                    eif = eif.reshape(eif.shape[0], eif.shape[1], -1)
                return (mtf, mtm, sp, ep, mif, etf, etm, eif)

            feats_fn.tables = default_tables
            return feats_fn

        text, mask, image = self.text, self.text_mask, self.image
        if self.quantized:
            default_tables = (text, self.text_scale)
            if not self.pooled:
                default_tables += (mask,)
            if has_img:
                default_tables += (image, self.image_scale)
        else:
            default_tables = (text,) if self.pooled else (text, mask)
            if has_img:
                default_tables += (image,)
        gathers: dict = {}

        def feats_fn(feats, tables=default_tables):
            (mtf, mtm, sp, ep, mif, rows) = feats
            C = rows.shape[1]
            if C not in gathers:
                gathers[C] = self._gather_fn(len(tables), C)
            got = list(gathers[C](*tables, rows))
            if self.quantized:
                etf = _dequantize(got.pop(0), got.pop(0), dt)
                etm = (jnp.zeros((rows.shape[0],), jnp.int32) if self.pooled
                       else got.pop(0))
                eif = (_dequantize(got.pop(0), got.pop(0), dt) if has_img
                       else placeholder_eif(rows))
            else:
                etf = got.pop(0)
                etm = (jnp.zeros((rows.shape[0],), jnp.int32) if self.pooled
                       else got.pop(0))
                eif = got.pop(0) if has_img else placeholder_eif(rows)
            if eif.ndim == 4:  # [B, C, 1, Dr] pooler rows -> [B, C, Dr]
                eif = eif.reshape(eif.shape[0], eif.shape[1], -1)
            return (mtf, mtm, sp, ep, mif, etf, etm, eif)

        feats_fn.tables = default_tables
        return feats_fn


def project_drin_tables(cfg: Config, tables: dict, params, chunk: int = 16384) -> dict:
    """Eval/serving cache: push the trained DRIN entity-side linears into the
    frozen global tables ONCE, so every eval forward skips its two heaviest
    entity matmuls (``cfg.entity_projected`` consumes the result).

    Exact math — ``linear(gather(T)) == gather(linear(T))`` for row gathers —
    the same hoisting argument as the pooled entity cache (equivalence test:
    tests/test_entity_cache.py).  Projects the text slot the configured
    pooling would select and keeps the raw CLS in slot 1 (the mtet edge reads
    it un-projected, models/drin.py EdgeEncoder).  Requires
    ``entity_final_output_dim == bert_embed_dim`` so both slots share one
    table (true for the reference config: both 768)."""
    assert cfg.entity_pooling_cached, "projection builds on the pooled cache layout"
    assert cfg.entity_final_output_dim == cfg.bert_embed_dim, (
        "projected slot 0 and raw-CLS slot 1 must share a table dim")
    ve = params["vertex_encoder"]
    tk = ve["entity_text_encoder"]["final_layer"]["Dense_0"]
    ik = ve["entity_image_linear"]["Dense_0"]
    text = tables["entity_text_feature"]  # [N, 2, D] (pooled, CLS)
    img = tables["entity_image_feature"]  # [N, 1, Dr] or [N, Dr]
    slot = 1 if cfg.entity_final_pooling == "bert default" else 0
    N = text.shape[0]
    t_out = np.empty((N, 2, cfg.bert_embed_dim), np.float32)
    i_out = np.empty((N, cfg.gcn_embed_dim), np.float32)

    @jax.jit
    def proj(t, i):
        tp = t[:, slot] @ jnp.asarray(tk["kernel"]) + jnp.asarray(tk["bias"])
        if i.ndim == 3:
            i = jnp.mean(i, axis=-2)
        ip = i @ jnp.asarray(ik["kernel"]) + jnp.asarray(ik["bias"])
        return tp, ip

    for i in range(0, N, chunk):
        tp, ip = proj(jnp.asarray(np.asarray(text[i : i + chunk]), jnp.float32),
                      jnp.asarray(np.asarray(img[i : i + chunk]), jnp.float32))
        t_out[i : i + chunk, 0] = np.asarray(tp)
        t_out[i : i + chunk, 1] = np.asarray(text[i : i + chunk, 1])
        i_out[i : i + chunk] = np.asarray(ip)
    new = dict(tables)
    new["entity_text_feature"] = t_out
    new["entity_image_feature"] = i_out
    return new
