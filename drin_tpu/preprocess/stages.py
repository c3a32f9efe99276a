# -*- coding: utf-8 -*-
"""Stages 2-4: frozen-encoder feature extraction as batched jitted programs.

TPU re-design of the reference's ``preprocess/{bert,resnet,clip}.py``:

  * real batches instead of batch size 1 (resnet.py:19, clip.py:18),
  * sequence lengths bucketed to multiples of 128 so each stage compiles a
    handful of XLA programs instead of padding everything to 512
    (bert.py:36 pads every item to max_bert_len),
  * threaded host-side image decode feeding the device (ImageBatcher),
  * output files follow the exact ``{field}_{split}.npy`` naming contract the
    datasets read (drin/data.py:47-71, :164-175, baselines/data.py:73-122).

Notably this stage *writes* ``entity-attr-mask.npy`` for WikiMEL, which the
reference's dataset reads (drin/data.py:166) but its bert.py forgets to save
separately (bert.py:108-109 drops the mask half of the tuple).

Encoder weights load from torch state_dict files (``cfg.*_checkpoint``) via
the converters in ``drin_tpu.encoders`` — no network access."""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import numpy as np

from drin_tpu.common.config import Config
from drin_tpu.common.npy_io import NpyWriter, load_field
from drin_tpu.preprocess.images import ImageBatcher, clip_preprocess, resnet_preprocess


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class RowShardedJit:
    """Data-parallel dispatch of a stage's jitted encoder over the local
    devices: batch rows shard over a 1-D mesh, the frozen encoder params
    replicate once, and a non-dividing tail pads with row-0 repeats and is
    sliced back — so the ``.npy`` writer sees the same rows in the same
    order as the single-device stage (equality-tested on the 8-device CPU
    mesh, tests/test_preprocess.py).

    Why: the reference pins its resnet/clip stages to GPU batch ONE
    (resnet.py:19, clip.py:18).  The batched jitted stages in this module
    already beat that ~100x on one chip; on a pod host this wrapper spreads
    each stage batch over every local chip instead of encoding WikiMEL's
    788,403 entity images on one chip while the rest idle.
    """

    def __init__(self, devices=None):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if devices is None:
            devices = jax.devices()
        if isinstance(devices, Mesh):
            devices = list(devices.devices.flat)
        self.devices = list(devices)
        self.n = len(self.devices)
        mesh = Mesh(np.asarray(self.devices), ("rows",))
        self.rows = NamedSharding(mesh, PartitionSpec("rows"))
        self.replicated = NamedSharding(mesh, PartitionSpec())

    def replicate(self, params):
        import jax

        return jax.device_put(params, self.replicated)

    def wrap(self, fn):
        """fn(params, *arrays) -> array or pytree of arrays, all with the
        batch as the leading dim.  Returns a callable with the same
        signature whose inputs shard row-wise over the mesh."""
        import jax

        jfn = jax.jit(fn)

        def call(params, *arrays):
            n = int(np.asarray(arrays[0]).shape[0])
            pad = -n % self.n
            if pad:
                arrays = tuple(
                    np.concatenate([np.asarray(a), np.repeat(np.asarray(a)[:1], pad, 0)])
                    for a in arrays)
            put = tuple(jax.device_put(np.asarray(a), self.rows) for a in arrays)
            out = jfn(params, *put)
            return jax.tree.map((lambda x: x[:n]) if pad else (lambda x: x), out)

        return call


def build_stage_jit(fn, params, mesh):
    """The ONE wiring point every stage uses for its encoder program:
    returns ``(callable, params, dp)`` — plain ``jax.jit`` when ``mesh`` is
    None, else a :class:`RowShardedJit`-wrapped dispatch with the params
    replicated over the mesh.  (Was copy-pasted per stage; a padding or
    replication fix must land once, not three times.)"""
    import jax

    if mesh is None:
        return jax.jit(fn), params, None
    dp = RowShardedJit(mesh)
    return dp.wrap(fn), dp.replicate(params), dp


def rows_per_dispatch(cfg: Config, dp) -> int:
    """Host batch rows per device dispatch: the per-device batch size times
    the mesh width when data-parallel."""
    return cfg.preprocess_batch_size * (dp.n if dp else 1)


# ---------------------------------------------------------------------------
# BERT stage (reference preprocess/bert.py)


class BertStage:
    def __init__(self, cfg: Config, params=None, bert_cfg=None, mesh=None):
        import jax

        from drin_tpu.encoders import bert as B
        from drin_tpu.text.wordpiece import BertTokenizer

        self.cfg = cfg
        if params is None:
            from drin_tpu.encoders.checkpoints import load_bert

            bert_cfg, params = load_bert(cfg.bert_checkpoint, bert_cfg)
        self.bert_cfg = bert_cfg or B.BertConfig()
        self.params = params
        self.model = B.BertModel(
            self.bert_cfg,
            fused_attention=B.resolve_fused_attention(cfg.bert_fused_attention))
        self.tokenizer = BertTokenizer(vocab_file=cfg.bert_vocab, do_lower_case=False,
                                       model_max_length=cfg.max_bert_len)
        fn = lambda p, ids, mask: self.model.apply({"params": p}, ids, mask)
        self._jit, self.params, self.dp = build_stage_jit(fn, self.params, mesh)

    def _encode_chunks(self, texts: Sequence[str], output: str, max_len: int):
        """Yield per-dispatch (features, mask-or-None) numpy chunks — the
        shared body of :meth:`encode_texts` (in-RAM) and
        :meth:`encode_texts_npy` (streamed)."""
        cfg = self.cfg
        B_ = rows_per_dispatch(cfg, self.dp)
        for i in range(0, len(texts), B_):
            chunk = [str(t) for t in texts[i : i + B_]]
            enc = self.tokenizer(chunk, padding=True, truncation=True, max_length=cfg.max_bert_len)
            ids, mask = enc["input_ids"], enc["attention_mask"]
            # bucket the padded length: few XLA programs, MXU-aligned
            L = min(_round_up(ids.shape[1], 128), cfg.max_bert_len)
            if ids.shape[1] < L:
                pad = L - ids.shape[1]
                ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=self.tokenizer.pad_id)
                mask = np.pad(mask, ((0, 0), (0, pad)))
            else:
                ids, mask = ids[:, :L], mask[:, :L]
            h, pooled = self._jit(self.params, ids, mask)
            if output == "pooler_output":
                yield np.asarray(pooled), None
            else:
                h = np.asarray(h)[:, :max_len]
                m = mask[:, :max_len]
                if h.shape[1] < max_len:  # short bucket: pad stored features
                    h = np.pad(h, ((0, 0), (0, max_len - h.shape[1]), (0, 0)))
                    m = np.pad(m, ((0, 0), (0, max_len - m.shape[1])))
                yield h, m

    def encode_texts(self, texts: Sequence[str], output: str, max_len: int):
        """Batched inference over raw texts, returned in RAM.

        output == 'last_hidden_state': returns (features [N, max_len, D],
        mask [N, max_len]) — the reference truncates stored features to
        max_len (bert.py:78-79).  output == 'pooler_output': [N, D].

        For store-writing at corpus scale use :meth:`encode_texts_npy`."""
        feats, masks = [], []
        for h, m in self._encode_chunks(texts, output, max_len):
            feats.append(h)
            if m is not None:
                masks.append(m)
        if output == "pooler_output":
            return np.concatenate(feats, 0)
        return np.concatenate(feats, 0), np.concatenate(masks, 0)

    def encode_texts_npy(self, texts: Sequence[str], output: str, max_len: int,
                         feat_path: str, mask_path: Optional[str] = None) -> None:
        """:meth:`encode_texts` streamed to ``.npy`` through
        :class:`NpyWriter`, one dispatch chunk at a time.

        The WikiMEL global entity pass is ~109k x 64 tokens x 768 f32 —
        >20GB that must never sit in host RAM (the reference accumulates it,
        bert.py:72-83 ``torch.cat``, leaning on its 100GB+ RAM requirement,
        readme.md:22; this repo's streaming-writer contract, SURVEY §2.2
        NpyWriter, applies to its own stages first)."""
        with NpyWriter(feat_path) as fw:
            mw = NpyWriter(mask_path) if mask_path is not None else None
            try:
                for h, m in self._encode_chunks(texts, output, max_len):
                    fw.extend(h)
                    if mw is not None:
                        assert m is not None, "mask_path needs last_hidden_state output"
                        mw.extend(m)
            finally:
                if mw is not None:
                    mw.close()

    def run(self, splits=("train", "valid", "test")):
        """Mirror of reference bert.py main (bert.py:86-109)."""
        cfg = self.cfg
        d = cfg.preprocess_dir
        if cfg.entity_text_type not in ("attr", "name", "brief"):
            raise ValueError(
                f"entity_text_type={cfg.entity_text_type!r} has no raw text "
                "source in the prepared store; use 'attr', 'name' or 'brief'")
        if cfg.entity_text_type == "brief" and cfg.dataset_name != "wikidiverse":
            # The wikimel store has name/attr sources only (qid2entity /
            # qid2attr joins); the reference's entity-brief-raw file is never
            # produced by any of its stages either (baselines/data.py:77-79
            # reads a file nothing writes).  Fail loudly instead of silently
            # encoding name-recipe text under the entity-brief-feature name.
            raise ValueError(
                "entity_text_type='brief' needs the wikidiverse store (its "
                "prepare stage joins entity2brief); wikimel has 'attr'/'name'")
        for split in splits:
            texts = load_field(d, "mention_text_raw", split)
            self.encode_texts_npy(
                texts, "last_hidden_state", cfg.max_mention_sentence_len,
                os.path.join(d, f"mention-text-feature_{split}.npy"),
                os.path.join(d, f"mention-text-mask_{split}.npy"))
            if cfg.dataset_name == "wikidiverse":
                # entity text source + output field follow entity_text_type
                # (the reference's loader surface, baselines/data.py:100-105;
                # its bert.py only ever produces the attr variant, bert.py:99-101).
                # 'brief' encodes the same strings prepare materialized — the
                # wikidiverse prepare's entity text IS the brief join
                # (reference prepare.py:91-97 stores it under the attr name) —
                # but under the entity-brief-feature name the loader expects.
                tt = cfg.entity_text_type
                raw_field = "entity_name_raw" if tt == "name" else "entity_attr_raw"
                texts = load_field(d, raw_field, split)
                self.encode_texts_npy(
                    texts, "pooler_output", cfg.max_entity_attr_token_len,
                    os.path.join(d, f"entity-{tt}-feature_{split}.npy"))
        if cfg.dataset_name == "wikimel":
            tt = cfg.entity_text_type
            with open(cfg.qid2entity_path) as f:
                qid2name = json.load(f)
            with open(cfg.qid2attr_path) as f:
                qid2attr = json.load(f)
            items = list(qid2attr.items())
            if tt == "name":
                texts = [qid2name[qid] for qid, _ in items]
            else:  # attr: "name. attrs" with periods collapsed (bert.py text recipe)
                texts = [qid2name[qid] + ". " + str(attr).replace(".", ";") for qid, attr in items]
            with open(os.path.join(d, "qid2idx.json"), "w") as f:
                json.dump({qid: i for i, (qid, _) in enumerate(items)}, f)
            # the global table is the >20GB pass that must stream (not
            # accumulate like the reference's torch.cat, bert.py:72-83)
            self.encode_texts_npy(
                texts, "last_hidden_state", cfg.max_entity_attr_token_len,
                os.path.join(d, f"entity-{tt}-feature.npy"),
                os.path.join(d, f"entity-{tt}-mask.npy"))


# ---------------------------------------------------------------------------
# ResNet stage (reference preprocess/resnet.py)


class ResnetStage:
    def __init__(self, cfg: Config, params=None, resnet_cfg=None,
                 detector: Optional[Callable] = None, mesh=None):
        import jax

        from drin_tpu.encoders import resnet as R

        self.cfg = cfg
        if params is None:
            from drin_tpu.encoders.checkpoints import load_resnet

            resnet_cfg, params = load_resnet(cfg.resnet_checkpoint, resnet_cfg)
        self.resnet_cfg = resnet_cfg or R.ResNetConfig()
        self.params = params
        self.model = R.ResNetModel(self.resnet_cfg)
        fn = lambda p, x: self.model.apply({"params": p}, x)
        # the detector stays single-device: it is an arbitrary user callable
        # (WholeImageDetector / converted FRCNN), not necessarily jittable
        self._jit, self.params, self.dp = build_stage_jit(fn, self.params, mesh)
        self.batcher = ImageBatcher(cfg.default_image, cfg.min_image_size, cfg.image_decode_workers)
        # object detector: callable [B,H,W,3]->(boxes [B,K,4], scores [B,K]);
        # defaults to whatever cfg.drin_object_detector/_checkpoint select
        # (drin_tpu.preprocess.detector.make_detector).  Never built when the
        # object arrays are imported from an existing store — that path must
        # not emit the stub detector's fidelity warning for a detector it
        # will never run.
        if detector is None and not cfg.import_objects_from:
            from drin_tpu.preprocess.detector import make_detector

            detector = make_detector(cfg)
        self.detector = detector

    def _run_images(self, paths, crops, output: str, writer: NpyWriter):
        cfg = self.cfg
        B_ = rows_per_dispatch(cfg, self.dp)
        for i in range(0, len(paths), B_):
            chunk = paths[i : i + B_]
            c = crops[i : i + B_] if crops is not None else None
            # decode at the BASE batch size even when the encoder dispatch is
            # n_devices wider (data-parallel stages): bounds host decode RAM
            x = self.batcher.load_batch_chunked(
                chunk,
                lambda im: resnet_preprocess(im, cfg.image_input_size,
                                             cfg.resnet_crop_pct, cfg.resnet_resample),
                c, chunk=cfg.preprocess_batch_size)
            h, pooled = self._jit(self.params, x)
            if output == "pooler_output":
                writer.extend(np.asarray(pooled)[:, None, :])  # [B, 1, C]
            else:
                h = np.asarray(h)  # [B, H', W', C] NHWC
                writer.extend(h.reshape(h.shape[0], -1, h.shape[-1]))  # [B, R, C]

    def infer(self, split: str, name: str, feature_output: str, object_output: str,
              image_paths: Sequence[str]):
        """Mirror of reference Inferrer.infer (resnet.py:144-162): whole-image
        features, then detector boxes/scores, then per-box crop features."""
        cfg = self.cfg
        d = cfg.preprocess_dir
        topk = cfg.object_topk[name]
        with NpyWriter(os.path.join(d, f"{name}-image-feature_{split}.npy")) as w:
            self._run_images(image_paths, None, feature_output, w)

        if cfg.import_objects_from:
            self._import_objects(split, name, topk, len(image_paths))
            return
        boxes, scores = self.detect(image_paths, topk)
        np.save(os.path.join(d, f"{name}-object-score_{split}.npy"), scores)
        flat_paths = np.repeat(np.asarray(image_paths), topk)
        flat_boxes = boxes.reshape(-1, 4)
        # close on error too: an abandoned writer leaks its handle and
        # leaves a placeholder header that np.load rejects with a cryptic
        # format error (the stage rewrites outputs on re-run, so a closed
        # partial file is harmless)
        w = NpyWriter(os.path.join(d, f"{name}-object-feature_{split}.npy"))
        try:
            self._run_images(flat_paths, flat_boxes, object_output, w)
            w.reshape([-1, topk, *w.shape])
        finally:
            w.close()

    def _import_objects(self, split: str, name: str, topk: int, n: int):
        """Adopt ``{name}-object-{feature,score}_{split}.npy`` VERBATIM from
        ``cfg.import_objects_from`` (the reference resnet stage's detector
        outputs, resnet.py:152-162) instead of running a detector: a store
        the reference preprocessed with its pretrained torchvision Faster
        R-CNN migrates with zero object-feature drift.  Shapes are validated
        against this run's config before the byte-for-byte file copy."""
        import shutil

        cfg = self.cfg
        src_dir = cfg.import_objects_from
        for field in ("feature", "score"):
            fname = f"{name}-object-{field}_{split}.npy"
            src = os.path.join(src_dir, fname)
            if not os.path.exists(src):
                raise FileNotFoundError(
                    f"import_objects_from={src_dir!r} has no {fname} — point "
                    "it at a store whose detector stage already produced the "
                    "object arrays for this dataset/split")
            arr = np.load(src, mmap_mode="r")
            if arr.shape[0] != n:
                raise ValueError(
                    f"{src}: {arr.shape[0]} rows, but this split has {n} "
                    f"{name} images — the imported store was built from "
                    "different raw data (or a different candidate count)")
            if field == "score" and tuple(arr.shape[1:]) != (topk,):
                raise ValueError(
                    f"{src}: per-image shape {tuple(arr.shape[1:])}, expected "
                    f"({topk},) — check {name}_object_topk against the store")
            if field == "feature" and (
                    arr.ndim < 3 or arr.shape[1] != topk
                    or arr.shape[-1] != cfg.resnet_embed_dim):
                raise ValueError(
                    f"{src}: per-image shape {tuple(arr.shape[1:])}, expected "
                    f"({topk}, ..., {cfg.resnet_embed_dim}) — check "
                    f"{name}_object_topk / resnet_embed_dim against the store")
            shutil.copyfile(src, os.path.join(cfg.preprocess_dir, fname))

    def detect(self, image_paths: Sequence[str], topk: int):
        """Top-k boxes/scores padded with default_box/0 (resnet.py:112-123).

        The detector receives resized [0, 1] images — the reference's
        ObjectProcessor convention (resnet.py:79-84), NOT ImageNet-normalized
        tensors; torchvision-style models normalize internally."""
        cfg = self.cfg
        B_ = cfg.preprocess_batch_size

        def raw01(im):
            im = im.resize(cfg.image_input_size)
            return np.asarray(im, dtype=np.float32) / 255.0

        all_boxes, all_scores = [], []
        for i in range(0, len(image_paths), B_):
            chunk = image_paths[i : i + B_]
            x = self.batcher.load_batch(chunk, raw01)
            b, s = self.detector(x, topk)
            all_boxes.append(np.asarray(b))
            all_scores.append(np.asarray(s))
        return np.concatenate(all_boxes, 0), np.concatenate(all_scores, 0)

    def run(self, splits=("valid", "train", "test")):
        """Mirror of reference resnet.py main (resnet.py:165-185)."""
        cfg = self.cfg
        d = cfg.preprocess_dir
        for split in splits:
            if cfg.dataset_name == "wikidiverse":
                paths = load_field(d, "entity_image_path", split)
                self.infer(split, "entity", "pooler_output", "pooler_output", paths)
                paths = load_field(d, "mention_image_path", split)
            else:
                with open(cfg.mention_text_path % split) as f:
                    mention_text = json.load(f)
                paths = [
                    os.path.join(cfg.mention_image_dir, k.split("-")[0])
                    for k, v in mention_text.items()
                    if v["mentions"] in v["sentence"]
                ]
            self.infer(split, "mention", "last_hidden_state", "pooler_output", paths)
        if cfg.dataset_name == "wikimel":
            with open(cfg.qid2entity_path) as f:
                qid2name = json.load(f)
            paths = [os.path.join(cfg.entity_image_dir, k) for k in qid2name]
            self.infer("all", "entity", "pooler_output", "pooler_output", paths)


# ---------------------------------------------------------------------------
# CLIP stage (reference preprocess/clip.py)


class ClipStage:
    def __init__(self, cfg: Config, params=None, clip_cfg=None, mesh=None):
        from drin_tpu.encoders import clip as C
        from drin_tpu.text.clip_bpe import CLIPTokenizer

        self.cfg = cfg
        if params is None:
            from drin_tpu.encoders.checkpoints import load_clip

            clip_cfg, params = load_clip(cfg.clip_checkpoint, clip_cfg)
        self.clip_cfg = clip_cfg or C.CLIPConfig()
        self.params = params
        self.model = C.CLIPModel(self.clip_cfg)
        self.tokenizer = CLIPTokenizer(vocab_file=cfg.clip_vocab, merges_file=cfg.clip_merges)
        self.build_jits(mesh)
        self.batcher = ImageBatcher(cfg.default_image, cfg.min_image_size, cfg.image_decode_workers)
        size = self.clip_cfg.vision.image_size
        self._preprocess = lambda im: clip_preprocess(im, size)

    def build_jits(self, mesh=None):
        """(Re)build the two encoder programs, optionally row-sharded over
        ``mesh``; split out of __init__ so tests that inject in-memory
        tokenizer assets share the exact dispatch path."""
        import jax
        import jax.numpy as jnp

        def text_feats(p, ids):
            t = self.model.apply({"params": p}, ids, method=self.model.get_text_features)
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True)

        def image_feats(p, pix):
            v = self.model.apply({"params": p}, pix, method=self.model.get_image_features)
            return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

        self._text_jit, self.params, self.dp = build_stage_jit(
            text_feats, self.params, mesh)
        self._image_jit = self.dp.wrap(image_feats) if self.dp else jax.jit(image_feats)

    def _embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Documented divergence from a reference bug (convention: reference
        bugs are documented, not emulated): for texts over 77 tokens the
        reference tokenizes WITHOUT truncation and then hard-chops at 77 via
        a negative constant_pad_nd (clip.py pad_tokens) — losing the eot
        token, so CLIP's argmax(input_ids) pooling reads an arbitrary
        max-id position.  Ours truncates eos-preservingly
        ([bos] + tokens[:75] + [eos]), pooling at a real eot; embeddings for
        such over-length texts intentionally differ from the reference's."""
        B_ = rows_per_dispatch(self.cfg, self.dp)
        out = []
        cap = self.clip_cfg.text.max_position_embeddings
        for i in range(0, len(texts), B_):
            enc = self.tokenizer([str(t) for t in texts[i : i + B_]], padding="max_length",
                                 truncation=True, max_length=min(77, cap))
            out.append(np.asarray(self._text_jit(self.params, enc["input_ids"])))
        return np.concatenate(out, 0)

    def _embed_images(self, paths: Sequence[str]) -> np.ndarray:
        B_ = rows_per_dispatch(self.cfg, self.dp)
        out = []
        for i in range(0, len(paths), B_):
            # decode chunked at the base batch size (host RAM bound) even
            # when the device dispatch is n_devices wider — see ResnetStage
            x = self.batcher.load_batch_chunked(
                paths[i : i + B_], self._preprocess,
                chunk=self.cfg.preprocess_batch_size)
            out.append(np.asarray(self._image_jit(self.params, x)))
        return np.concatenate(out, 0)

    def _wikimel_sources(self, split: str):
        """WikiMEL: mention images by mention id, entity text/images by qid
        (behavioral equivalent of the reference's legacy MIETDataWM/EIMTDataWM,
        clip.py:30-80 — its current main() only covers wikidiverse even
        though wikimel training requires these similarity files)."""
        cfg = self.cfg
        d = cfg.preprocess_dir
        C_ = cfg.num_candidates_model
        with open(cfg.mention_text_path % split) as f:
            mention_text = json.load(f)
        mention_images = [
            os.path.join(cfg.mention_image_dir, k.split("-")[0])
            for k, v in mention_text.items()
            if v["mentions"] in v["sentence"]
        ]
        qids = load_field(d, "entity_name_raw", split).reshape(-1, C_)
        with open(cfg.qid2entity_path) as f:
            qid2name = json.load(f)
        with open(cfg.qid2attr_path) as f:
            qid2attr = json.load(f)
        entity_texts = np.vectorize(
            lambda q: qid2name[q] + ". " + str(qid2attr[q]).replace(".", ";")
        )(qids)
        entity_images = np.vectorize(lambda q: os.path.join(cfg.entity_image_dir, q))(qids)
        return np.asarray(mention_images), entity_texts, entity_images

    def run(self, splits=("valid", "train", "test")):
        """Cross-modal similarity matrices (reference clip.py:158-172).

        The reference embeds the mention image C times (once per candidate,
        batch pinned to 1); here each unique image/text is embedded once and
        the [N, C] logit matrices are one batched einsum row-wise."""
        cfg = self.cfg
        d = cfg.preprocess_dir
        C_ = cfg.num_candidates_model
        scale = float(np.exp(np.asarray(self.params["logit_scale"])))
        for split in splits:
            if cfg.dataset_name == "wikimel":
                mention_images, entity_texts, entity_images = self._wikimel_sources(split)
            else:
                mention_images = load_field(d, "mention_image_path", split)
                entity_texts = load_field(d, "entity_attr_raw", split).reshape(-1, C_)
                entity_images = load_field(d, "entity_image_path", split).reshape(-1, C_)
            target = os.path.join(d, f"similarity-miet_{split}.npy")
            if not os.path.exists(target):  # resumable, like the reference
                v = self._embed_images(mention_images)  # [N, P]
                t = self._embed_texts(entity_texts.reshape(-1))  # [N*C, P]
                t = t.reshape(len(v), C_, -1)
                sims = scale * np.einsum("np,ncp->nc", v, t)
                np.save(target, sims.astype(np.float32))
            target = os.path.join(d, f"similarity-eimt_{split}.npy")
            if not os.path.exists(target):
                mention_texts = load_field(d, "mention_text_raw", split)
                t = self._embed_texts(mention_texts)  # [N, P]
                v = self._embed_images(entity_images.reshape(-1)).reshape(len(t), C_, -1)
                sims = scale * np.einsum("np,ncp->nc", t, v)
                np.save(target, sims.astype(np.float32))
