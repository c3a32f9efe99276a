# -*- coding: utf-8 -*-
"""Stage 1: raw JSON/TSV -> uniform intermediate ``.npy`` arrays.

Behavioral equivalent of the reference's ``preprocess/prepare.py``: char-level
mention spans become BERT token positions (double-tokenize + attention-mask
count, prepare.py:31-52); WikiDiverse candidates are padded to
``num_candidates_data`` with ``"__nil__"`` then the gold answer is appended
as the extra candidate (prepare.py:84-86); unmatched answers get index
``num_candidates_data`` (prepare.py:80-83); entity images resolve through the
md5-hashed filename scheme with suffix normalization and corrupt/too-small ->
default fallback (prepare.py:121-137); missing briefs/answers are counted and
defaulted (prepare.py:91-97).

Output field contract (prepare.py:8): mention_text_raw, mention_image_path,
start/end_pos, entity_attr_raw / entity_name_raw, entity_image_path, answer.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Dict, List
from urllib.parse import unquote

import numpy as np

from drin_tpu.common.config import Config
from drin_tpu.common.npy_io import save_field
from drin_tpu.text.wordpiece import BertTokenizer


class MentionPositionProcessor:
    """Char span -> token span: tokens(prefix) and tokens(mention) counted via
    attention-mask sums minus CLS/SEP (reference prepare.py:31-52)."""

    def __init__(self, tokenizer: BertTokenizer):
        self.tokenizer = tokenizer

    def __call__(self, sentences: List[str], starts, ends):
        before = [s[:b] for s, b in zip(sentences, starts)]
        mentions = [s[b:e] for s, b, e in zip(sentences, starts, ends)]
        n_before = self.tokenizer(before, padding=True, truncation=True)["attention_mask"].sum(-1) - 2
        n_mention = self.tokenizer(mentions, padding=True, truncation=True)["attention_mask"].sum(-1) - 2
        return n_before, n_before + n_mention


class WDPrepare:
    """WikiDiverse raw -> intermediate (reference WDProcess, prepare.py:55-148)."""

    def __init__(self, cfg: Config, mpp: MentionPositionProcessor, check_images: bool = True):
        self.cfg = cfg
        self.mpp = mpp
        self.check_images = check_images
        self.entity2image: Dict[str, List[str]] = {}
        with open(cfg.entity2image_path) as f:
            f.readline()
            for line in f:
                line = line.strip()
                if line:
                    parts = line.split("@@@@")
                    self.entity2image[parts[0]] = parts[1].split("[AND]")

    def run(self, split: str) -> dict:
        cfg = self.cfg
        mention_text, mention_image, start_pos, end_pos, answer = [], [], [], [], []
        entity_image, entity_brief = [], []
        with open(cfg.mention_text_path % split) as f:
            data = json.load(f)
        with open(cfg.entity2brief_path % split) as f:
            entity2brief = json.load(f)
        stats = dict(image_errors=0, brief_missing=0, no_matching=0)
        for item in data:
            candidates = [unquote(c.split("/")[-1]) for c in item[7]]
            answer_name = unquote(item[6].split("/")[-1])
            try:
                answer.append(candidates.index(answer_name))
            except ValueError:
                stats["no_matching"] += 1
                answer.append(cfg.num_candidates_data)
            while len(candidates) < cfg.num_candidates_data:
                candidates.append("__nil__")
            candidates.append(answer_name)  # the extra answer candidate
            mention_text.append(item[0])
            mention_image.append(self.get_image_path(item[1]))
            start_pos.append(item[9])
            end_pos.append(item[10])
            for name in candidates:
                try:
                    brief = (name + ": " + entity2brief[name])[: cfg.max_entity_attr_char_len]
                except KeyError:
                    brief = "" if name == "__nil__" else name
                    stats["brief_missing"] += 1
                entity_brief.append(brief)
                image = self.get_entity_image(name)
                entity_image.append(image)
                stats["image_errors"] += image == cfg.default_image
        start_pos, end_pos = self.mpp(mention_text, start_pos, end_pos)
        out = dict(
            mention_text_raw=np.asarray(mention_text),
            mention_image_path=np.asarray(mention_image),
            start_pos=start_pos,
            end_pos=end_pos,
            answer=np.asarray(answer),
            entity_image_path=np.asarray(entity_image),
            entity_attr_raw=np.asarray(entity_brief),
        )
        for k, v in out.items():
            save_field(cfg.preprocess_dir, k, v, split)
        print(f"[prepare:{split}] n={len(mention_text)} {stats}")
        return out

    def get_image_path(self, url: str) -> str:
        """md5-hashed local filename + suffix normalization + validity check
        (reference prepare.py:121-137)."""
        cfg = self.cfg
        image_path = url.split("/")[-1]
        prefix = hashlib.md5(image_path.encode()).hexdigest()
        suffix = re.sub(r"(\S+(?=\.(jpg|JPG|png|PNG|svg|SVG)))|(\S+(?=\.(jpeg|JPEG)))", "", image_path)
        image_path = os.path.join(cfg.image_dir, prefix + suffix)
        image_path = image_path.replace(".svg", ".png").replace(".SVG", ".png")
        if not self.check_images:
            return image_path
        try:
            from PIL import Image

            image = Image.open(image_path)
            if image.size[0] < cfg.min_image_size[0] or image.size[1] < cfg.min_image_size[1]:
                raise ValueError("image is too small")
            image.resize((224, 224))
        except Exception:
            return cfg.default_image
        return image_path

    def get_entity_image(self, name: str) -> str:
        for url in self.entity2image.get(name, ()):
            image = self.get_image_path(url)
            if image != self.cfg.default_image:
                return image
        return self.cfg.default_image


class WMPrepare:
    """WikiMEL raw -> intermediate (reference WMProcess, prepare.py:151-197)."""

    def __init__(self, cfg: Config, mpp: MentionPositionProcessor):
        self.cfg = cfg
        self.mpp = mpp
        self.id2candidate: Dict[str, List[str]] = {}
        with open(cfg.candidate_path) as f:
            for line in f:
                items = line.strip().split("\t")
                self.id2candidate[items[0]] = items[1:]

    def run(self, split: str) -> dict:
        cfg = self.cfg
        with open(cfg.mention_text_path % split) as f:
            data = json.load(f)
        mention_text, start_pos, end_pos, answer, entity_name = [], [], [], [], []
        stats = dict(no_matching=0, mention_not_found=0)
        for id_, info in data.items():
            candidate = self.id2candidate[id_]
            try:
                start = info["sentence"].index(info["mentions"])
            except ValueError:
                stats["mention_not_found"] += 1
                continue
            start_pos.append(start)
            end_pos.append(start + len(info["mentions"]))
            try:
                answer.append(candidate.index(info["answer"]))
            except ValueError:
                stats["no_matching"] += 1
                answer.append(cfg.num_candidates_data)
            mention_text.append(info["sentence"])
            entity_name.extend(candidate + [info["answer"]])  # answer appended last
        start_pos, end_pos = self.mpp(mention_text, start_pos, end_pos)
        out = dict(
            mention_text_raw=np.asarray(mention_text),
            entity_name_raw=np.asarray(entity_name),
            start_pos=start_pos,
            end_pos=end_pos,
            answer=np.asarray(answer),
        )
        for k, v in out.items():
            save_field(cfg.preprocess_dir, k, v, split)
        print(f"[prepare:{split}] n={len(mention_text)} {stats}")
        return out


def run_prepare(cfg: Config, splits=("valid", "train", "test"), check_images: bool = True):
    os.makedirs(cfg.preprocess_dir, exist_ok=True)
    tok = BertTokenizer(vocab_file=cfg.bert_vocab, do_lower_case=False)
    mpp = MentionPositionProcessor(tok)
    proc = WDPrepare(cfg, mpp, check_images) if cfg.dataset_name == "wikidiverse" else WMPrepare(cfg, mpp)
    for split in splits:
        proc.run(split)
