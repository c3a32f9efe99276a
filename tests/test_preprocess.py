# -*- coding: utf-8 -*-
"""Preprocessing pipeline tests: detection ops vs numpy oracles, and the full
raw-data -> feature-store -> model pipeline on fabricated datasets with tiny
random encoders."""

import hashlib
import json
import os

import numpy as np
import pytest
import jax

from drin_tpu.data.synthetic import tiny_config


# ---------------------------------------------------------------------------
# detection ops


def _nms_numpy(boxes, scores, thresh, topk):
    """Greedy NMS oracle."""
    order = list(np.argsort(-scores))
    keep = []
    alive = set(order)
    while order and len(keep) < topk:
        i = order.pop(0)
        if i not in alive:
            continue
        keep.append(i)
        for j in list(alive):
            if j == i:
                alive.discard(j)
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > thresh:
                alive.discard(j)
    return keep + [-1] * (topk - len(keep))


def test_nms_matches_numpy_oracle(rng):
    from drin_tpu.ops.detection import nms

    for trial in range(5):
        n = 40
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        got = np.asarray(nms(boxes, scores, 0.5, 10))
        want = _nms_numpy(boxes, scores, 0.5, 10)
        np.testing.assert_array_equal(got, want)


def test_roi_align_constant_and_center():
    from drin_tpu.ops.detection import roi_align

    # constant feature map: every bin must equal the constant
    f = np.full((16, 16, 3), 2.5, np.float32)
    boxes = np.array([[2.0, 2.0, 10.0, 10.0], [0.0, 0.0, 16.0, 16.0]], np.float32)
    out = np.asarray(roi_align(f, boxes, (4, 4)))
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)

    # linear ramp: sampled values must equal the ramp at sample centers
    ramp = np.broadcast_to(np.arange(16, dtype=np.float32)[None, :, None], (16, 16, 1)).copy()
    box = np.array([[4.0, 4.0, 8.0, 8.0]], np.float32)
    out = np.asarray(roi_align(ramp, box, (2, 2), sampling_ratio=1))[0, :, :, 0]
    # bin centers in x: 4 + {0.5,1.5}*2 - 0.5(aligned) = {4.5, 6.5}; ramp(x)=x
    np.testing.assert_allclose(out, np.array([[4.5, 6.5], [4.5, 6.5]]), rtol=1e-5)

    # torchvision zero-pads samples outside [-1, H]/[-1, W] instead of
    # clamping to the border: a box extending past the map must read zeros
    # in its fully-outside bins and the constant in its fully-inside bins
    out = np.asarray(roi_align(f, np.array([[12.0, 12.0, 20.0, 20.0]], np.float32),
                               (4, 4)))[0, :, :, 0]
    np.testing.assert_allclose(out[0, 0], 2.5, rtol=1e-6)  # inside
    np.testing.assert_allclose(out[3, 3], 0.0, atol=1e-6)  # past the border


# ---------------------------------------------------------------------------
# fabricated raw data + tiny encoders -> full pipeline


def _write_image(path, rng, size=(80, 70)):
    from PIL import Image

    arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def _tiny_encoders(texts):
    """Random tiny flax encoders + tokenizer assets shared by the stages."""
    from drin_tpu.encoders.bert import BertConfig, BertModel
    from drin_tpu.encoders.clip import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig
    from drin_tpu.encoders.resnet import ResNetConfig, ResNetModel
    from drin_tpu.text.wordpiece import build_tiny_vocab
    from drin_tpu.text.clip_bpe import bytes_to_unicode

    vocab = build_tiny_vocab(texts)
    bert_cfg = BertConfig(vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=32, max_position_embeddings=512)
    bert = BertModel(bert_cfg)
    bert_params = bert.init(jax.random.key(0), np.zeros((1, 8), np.int32), np.ones((1, 8), np.int32))["params"]

    resnet_cfg = ResNetConfig(embedding_size=8, hidden_sizes=(8, 12, 16, 24), depths=(1, 1, 1, 1))
    resnet = ResNetModel(resnet_cfg)
    resnet_params = resnet.init(jax.random.key(1), np.zeros((1, 64, 64, 3), np.float32))["params"]

    clip_cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=600, hidden_size=16, num_layers=1, num_heads=2,
                            intermediate_size=32, max_position_embeddings=77),
        vision=CLIPVisionConfig(hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
                                image_size=32, patch_size=8),
        projection_dim=12,
    )
    clip = CLIPModel(clip_cfg)
    clip_params = clip.init(jax.random.key(2), np.zeros((1, 8), np.int32),
                            np.zeros((1, 32, 32, 3), np.float32))["params"]

    b2u = bytes_to_unicode()
    alphabet = sorted(set(b2u.values()))
    cvocab = {}
    for ch in alphabet:
        cvocab[ch] = len(cvocab)
    for ch in alphabet:
        cvocab[ch + "</w>"] = len(cvocab)
    cvocab["<|startoftext|>"] = len(cvocab)
    cvocab["<|endoftext|>"] = len(cvocab)
    return dict(
        vocab=vocab, bert_cfg=bert_cfg, bert_params=bert_params,
        resnet_cfg=resnet_cfg, resnet_params=resnet_params,
        clip_cfg=clip_cfg, clip_params=clip_params, clip_vocab=cvocab,
    )


@pytest.fixture(scope="module")
def wd_raw(tmp_path_factory):
    """Fabricated WikiDiverse raw dataset (reference raw format,
    prepare.py:55-148)."""
    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("wd-raw")
    image_dir = root / "images"
    image_dir.mkdir()
    names = [f"Entity_{i}" for i in range(8)]
    sentences = [
        "Alice visited the Eiffel Tower in Paris",
        "Bob photographed the Golden Gate Bridge yesterday",
        "The cat sat on the old red mat",
        "Quantum computers factor numbers quickly enough",
    ]
    # default image
    _write_image(root / "default.jpg", rng)

    # entity images: entity i -> url "e{i}.jpg" -> md5-named file
    lines = ["header"]
    for i, name in enumerate(names):
        url = f"http://img/e{i}.jpg"
        fname = hashlib.md5(f"e{i}.jpg".encode()).hexdigest() + ".jpg"
        if i % 3 != 0:  # some entities get real images, others fall back
            _write_image(image_dir / fname, rng)
        lines.append(f"{name}@@@@{url}")
    (root / "entity2imgs.tsv").write_text("\n".join(lines))

    n_cand = 3
    for split in ("train", "valid", "test"):
        data = []
        for j, sent in enumerate(sentences):
            words = sent.split()
            w = words[1 if j % 2 else 0]
            start = sent.index(w)
            cands = [f"http://wiki/{names[(j + k) % len(names)]}" for k in range(n_cand)]
            answer = cands[j % n_cand] if j != 3 else "http://wiki/Nowhere_Man"  # one no-match
            murl = f"http://img/m{j}.jpg"
            mf = hashlib.md5(f"m{j}.jpg".encode()).hexdigest() + ".jpg"
            _write_image(image_dir / mf, rng)
            item = [sent, murl, None, None, None, None, answer, cands, None, start, start + len(w)]
            data.append(item)
        (root / f"{split}_cands.json").write_text(json.dumps(data))
        briefs = {n: f"a thing called {n.lower()} with properties" for n in names[:6]}
        (root / f"brief_{split}.json").write_text(json.dumps(briefs))
    return root, sentences, names, n_cand


def _wd_cfg_for(root, n_cand, store, assets):
    vocab_path = str(root / "vocab.txt")
    inv = {v: k for k, v in assets["vocab"].items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")
    return tiny_config("wikidiverse", "drin", preprocess_dir=str(store)).replace(
        num_candidates_data=n_cand,
        metrics_topk=(1, 3),
        bert_embed_dim=16,
        resnet_embed_dim=24,
        gcn_embed_dim=16,
        image_input_size=(64, 64),
        resnet_num_region=4,
        mention_text_path=str(root / "%s_cands.json"),
        entity2brief_path=str(root / "brief_%s.json"),
        entity2image_path=str(root / "entity2imgs.tsv"),
        image_dir=str(root / "images"),
        default_image=str(root / "default.jpg"),
        bert_vocab=vocab_path,
        preprocess_batch_size=8,
        max_entity_attr_char_len=64,
        max_entity_attr_token_len=8,
        max_mention_sentence_len=12,
    )


def test_full_pipeline_wikidiverse(wd_raw, tmp_path):
    """prepare -> bert -> resnet -> clip on fabricated raw data, then load the
    store and run a DRIN forward + train step on it."""
    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences + [f"{n}: a thing" for n in names])
    cfg = _wd_cfg_for(root, n_cand, tmp_path / "store", assets)
    os.makedirs(cfg.preprocess_dir, exist_ok=True)

    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import BertStage, ClipStage, ResnetStage

    run_prepare(cfg)
    # intermediate contract
    from drin_tpu.common.npy_io import load_field

    ans = load_field(cfg.preprocess_dir, "answer", "train")
    assert ans.shape == (4,)
    assert ans[3] == n_cand  # the no-match row
    eap = load_field(cfg.preprocess_dir, "entity_attr_raw", "train")
    assert eap.shape == (4 * (n_cand + 1),)  # candidates + appended answer

    BertStage(cfg, assets["bert_params"], assets["bert_cfg"]).run()
    ResnetStage(cfg, assets["resnet_params"], assets["resnet_cfg"]).run()
    clip_stage = ClipStage.__new__(ClipStage)  # build with injected tokenizer assets
    _init_clip_stage(clip_stage, cfg, assets)
    clip_stage.run()

    # the produced store loads through the training dataset and feeds DRIN
    from drin_tpu.data.dataset import create_datasets
    from drin_tpu.models.drin import DRIN
    from drin_tpu.train.loss import triplet_loss

    train, valid, test = create_datasets(cfg)
    batch = next(train.batches(4, kind="drin"))
    assert batch.mention_text_feature.shape == (4, cfg.max_mention_sentence_len, 16)
    assert batch.entity_text_feature.shape == (4, n_cand + 1, 16)
    assert batch.miet_similarity.shape == (4, n_cand + 1)
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), batch[:-1])["params"]
    scores = model.apply({"params": params}, batch[:-1])
    assert np.all(np.isfinite(np.asarray(scores)))
    loss = triplet_loss(np.asarray(batch.answer), scores, cfg.triplet_margin)
    assert np.isfinite(float(loss))


def test_stages_data_parallel_match_single_device(wd_raw, tmp_path):
    """Every encoder stage run with a device mesh (rows sharded over all 8
    virtual devices, RowShardedJit) writes the SAME store as the
    single-device stage, row for row — the .npy writer order is
    deterministic and pad rows never leak (VERDICT r3 next-#5)."""
    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences + [f"{n}: a thing" for n in names])
    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import BertStage, ClipStage, ResnetStage

    stores = {}
    for tag, mesh in (("one", None), ("dp", jax.devices()[:8])):
        cfg = _wd_cfg_for(root, n_cand, tmp_path / f"store-{tag}", assets)
        os.makedirs(cfg.preprocess_dir, exist_ok=True)
        run_prepare(cfg)
        BertStage(cfg, assets["bert_params"], assets["bert_cfg"], mesh=mesh).run()
        ResnetStage(cfg, assets["resnet_params"], assets["resnet_cfg"], mesh=mesh).run()
        clip_stage = ClipStage.__new__(ClipStage)
        _init_clip_stage(clip_stage, cfg, assets, mesh=mesh)
        clip_stage.run()
        stores[tag] = cfg.preprocess_dir

    files = sorted(f for f in os.listdir(stores["one"]) if f.endswith(".npy"))
    assert any("feature" in f for f in files) and any("similarity" in f for f in files)
    assert files == sorted(f for f in os.listdir(stores["dp"]) if f.endswith(".npy"))
    for f in files:
        a = np.load(os.path.join(stores["one"], f))
        b = np.load(os.path.join(stores["dp"], f))
        assert a.shape == b.shape, f
        if a.dtype.kind in "fc":
            # same math per row; only reduction scheduling may differ when
            # the sharded stage's one 16-row chunk replaces two 8-row chunks
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6, err_msg=f)
        else:
            np.testing.assert_array_equal(b, a, err_msg=f)


def test_resnet_stage_imports_object_arrays(wd_raw, tmp_path):
    """``import_objects_from`` (VERDICT r4 next-#6): the resnet stage adopts
    the detector-derived arrays ({name}-object-feature/-score per split)
    VERBATIM from an existing store — e.g. one the reference preprocessed
    with its pretrained torchvision Faster R-CNN (resnet.py:152-162) — so a
    migrating user gets zero object-feature drift; whole-image features are
    still computed here.  CLI: ``python -m drin_tpu.preprocess resnet
    import_objects_from=/path/to/reference/store`` (any cfg override).
    Also pins the refusals: missing source file, and a topk mismatch."""
    import filecmp

    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import ResnetStage

    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences + [f"{n}: a thing" for n in names])

    # source store (stands in for a reference-preprocessed one; the files
    # follow the same on-disk naming contract)
    cfg_src = _wd_cfg_for(root, n_cand, tmp_path / "src", assets)
    os.makedirs(cfg_src.preprocess_dir, exist_ok=True)
    run_prepare(cfg_src)
    ResnetStage(cfg_src, assets["resnet_params"], assets["resnet_cfg"]).run()

    cfg = _wd_cfg_for(root, n_cand, tmp_path / "dst", assets).replace(
        import_objects_from=cfg_src.preprocess_dir)
    os.makedirs(cfg.preprocess_dir, exist_ok=True)
    run_prepare(cfg)
    stage = ResnetStage(cfg, assets["resnet_params"], assets["resnet_cfg"])
    assert stage.detector is None  # never built -> no stub fidelity warning
    stage.run()

    for name in ("mention", "entity"):
        for split in ("train", "valid", "test"):
            for field in ("object-feature", "object-score"):
                f = f"{name}-{field}_{split}.npy"
                assert filecmp.cmp(os.path.join(cfg_src.preprocess_dir, f),
                                   os.path.join(cfg.preprocess_dir, f),
                                   shallow=False), f"{f} not byte-identical"
            # whole-image features are computed by this run, not copied
            assert os.path.exists(os.path.join(
                cfg.preprocess_dir, f"{name}-image-feature_{split}.npy"))

    # refusal: empty source directory names the missing file and the knob
    empty = tmp_path / "empty-src"
    empty.mkdir()
    cfg_bad = _wd_cfg_for(root, n_cand, tmp_path / "dst-bad", assets).replace(
        import_objects_from=str(empty))
    os.makedirs(cfg_bad.preprocess_dir, exist_ok=True)
    run_prepare(cfg_bad)
    with pytest.raises(FileNotFoundError, match="import_objects_from"):
        ResnetStage(cfg_bad, assets["resnet_params"], assets["resnet_cfg"]).run()

    # refusal: a config whose topk disagrees with the imported store's shape
    cfg_topk = _wd_cfg_for(root, n_cand, tmp_path / "dst-topk", assets).replace(
        import_objects_from=cfg_src.preprocess_dir,
        mention_object_topk=cfg_src.mention_object_topk + 1,
        entity_object_topk=cfg_src.entity_object_topk + 1)
    os.makedirs(cfg_topk.preprocess_dir, exist_ok=True)
    run_prepare(cfg_topk)
    with pytest.raises(ValueError, match="object_topk"):
        ResnetStage(cfg_topk, assets["resnet_params"], assets["resnet_cfg"]).run()


def test_image_batcher_chunked_decode(tmp_path):
    """load_batch_chunked (ADVICE r4): identical output to one load_batch
    call, while the underlying decode never sees more than ``chunk`` rows —
    data-parallel stages widen the DEVICE dispatch, not the host decode
    working set."""
    from PIL import Image

    from drin_tpu.preprocess.images import ImageBatcher

    rng = np.random.default_rng(5)
    paths = []
    for i in range(11):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.integers(0, 255, (60, 70, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    default = tmp_path / "default.jpg"
    Image.new("RGB", (64, 64)).save(default)

    b = ImageBatcher(str(default), (8, 8), workers=2)
    pre = lambda im: np.asarray(im.resize((16, 16)), np.float32) / 255.0
    whole = b.load_batch(paths, pre)

    widths = []
    orig = ImageBatcher.load_batch

    def spy(self, ps, preprocess, crops=None):
        widths.append(len(ps))
        return orig(self, ps, preprocess, crops)

    ImageBatcher.load_batch = spy
    try:
        chunked = b.load_batch_chunked(paths, pre, chunk=4)  # uneven chunks
        passthrough = b.load_batch_chunked(paths, pre, chunk=0)
    finally:
        ImageBatcher.load_batch = orig
    np.testing.assert_array_equal(chunked, whole)
    np.testing.assert_array_equal(passthrough, whole)
    assert max(widths[:3]) <= 4 and widths[:3] == [4, 4, 3]

    # crops thread through sub-chunks aligned with their paths
    crops = [(0, 0, 32, 32)] * 5 + [(0, 0, 0, 0)] * 6
    np.testing.assert_array_equal(
        b.load_batch_chunked(paths, pre, crops, chunk=3),
        b.load_batch(paths, pre, crops))
    b.close()


def test_bert_stage_brief_variant(wd_raw, tmp_path):
    """entity_text_type='brief' on the wikidiverse store encodes the brief
    strings prepare materialized (reference prepare.py:91-97 — its entity
    text IS the brief join) under the entity-brief-feature name the loader
    surface expects (baselines/data.py:100-105), and the offline dataset
    reads it back; wikimel has no brief source and must refuse loudly."""
    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences + [f"{n}: a thing" for n in names])
    cfg = _wd_cfg_for(root, n_cand, tmp_path / "store", assets)
    os.makedirs(cfg.preprocess_dir, exist_ok=True)

    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import BertStage

    run_prepare(cfg)
    BertStage(cfg, assets["bert_params"], assets["bert_cfg"]).run(splits=("train",))
    cfg_brief = cfg.replace(entity_text_type="brief")
    BertStage(cfg_brief, assets["bert_params"], assets["bert_cfg"]).run(splits=("train",))
    attr = np.load(os.path.join(cfg.preprocess_dir, "entity-attr-feature_train.npy"))
    brief = np.load(os.path.join(cfg.preprocess_dir, "entity-brief-feature_train.npy"))
    np.testing.assert_array_equal(brief, attr)  # same source strings by design

    # the offline loader resolves the field name from entity_text_type
    from drin_tpu.common import npy_io

    etf = npy_io.load_field(cfg.preprocess_dir, "entity_brief_feature", "train")
    assert etf.shape == brief.shape

    with pytest.raises(ValueError, match="brief"):
        BertStage(cfg_brief.replace(dataset_name="wikimel"),
                  assets["bert_params"], assets["bert_cfg"]).run(splits=())
    with pytest.raises(ValueError, match="brie|attr"):
        BertStage(cfg.replace(entity_text_type="bogus"),
                  assets["bert_params"], assets["bert_cfg"]).run(splits=())


def _init_clip_stage(stage, cfg, assets, mesh=None):
    """ClipStage with in-memory tokenizer assets (no vocab files); the
    encoder programs come from the stage's own build_jits so tests exercise
    the production (optionally row-sharded) dispatch path."""
    from drin_tpu.preprocess.images import ImageBatcher, clip_preprocess
    from drin_tpu.preprocess.stages import ClipStage
    from drin_tpu.text.clip_bpe import CLIPTokenizer

    stage.cfg = cfg
    stage.clip_cfg = assets["clip_cfg"]
    stage.params = assets["clip_params"]
    from drin_tpu.encoders.clip import CLIPModel

    stage.model = CLIPModel(stage.clip_cfg)
    stage.tokenizer = CLIPTokenizer(vocab=assets["clip_vocab"], merges=[])
    ClipStage.build_jits(stage, mesh)
    stage.batcher = ImageBatcher(cfg.default_image, cfg.min_image_size, 4)
    size = stage.clip_cfg.vision.image_size
    stage._preprocess = lambda im: clip_preprocess(im, size)


def test_prepare_and_bert_wikimel(tmp_path):
    """WikiMEL raw format: candidates TSV + qid jsons -> global entity table
    with qid2idx + per-split arrays (reference WMProcess + bert.py:102-109)."""
    rng = np.random.default_rng(9)
    root = tmp_path
    qids = [f"Q{i}" for i in range(6)]
    qid2name = {q: f"name {q}" for q in qids}
    qid2attr = {q: f"attribute text for {q}. more" for q in qids}
    (root / "qid2ne.json").write_text(json.dumps(qid2name))
    (root / "qid2abs.json").write_text(json.dumps(qid2attr))
    n_cand = 2
    mentions = {
        "m1-x": {"sentence": "Alpha beta gamma delta", "mentions": "beta", "answer": "Q1"},
        "m2-x": {"sentence": "Epsilon zeta eta theta", "mentions": "zeta", "answer": "Q5"},
        "m3-x": {"sentence": "No mention here at all", "mentions": "zzz", "answer": "Q0"},
    }
    for split in ("train", "valid", "test"):
        (root / f"WIKIMEL_{split}.json").write_text(json.dumps(mentions))
    lines = [f"m1-x\tQ0\tQ1", f"m2-x\tQ2\tQ3", f"m3-x\tQ4\tQ5"]
    (root / "cands.tsv").write_text("\n".join(lines))

    texts = [m["sentence"] for m in mentions.values()] + list(qid2attr.values()) + list(qid2name.values())
    assets = _tiny_encoders(texts)
    vocab_path = str(root / "vocab.txt")
    inv = {v: k for k, v in assets["vocab"].items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")

    cfg = tiny_config("wikimel", "drin", preprocess_dir=str(root / "store")).replace(
        num_candidates_data=n_cand,
        metrics_topk=(1,),
        bert_embed_dim=16,
        mention_text_path=str(root / "WIKIMEL_%s.json"),
        candidate_path=str(root / "cands.tsv"),
        qid2entity_path=str(root / "qid2ne.json"),
        qid2attr_path=str(root / "qid2abs.json"),
        bert_vocab=vocab_path,
        preprocess_batch_size=4,
        max_entity_attr_token_len=8,
        max_mention_sentence_len=12,
    )
    os.makedirs(cfg.preprocess_dir, exist_ok=True)

    from drin_tpu.common.npy_io import load_field
    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import BertStage

    run_prepare(cfg)
    # m3 skipped (mention not in sentence) -> 2 rows; answer appended per row
    assert load_field(cfg.preprocess_dir, "answer", "train").shape == (2,)
    assert load_field(cfg.preprocess_dir, "entity_name_raw", "train").shape == (2 * (n_cand + 1),)
    # token positions: "beta" is word 2 -> start 1 end 2 (0-based tokens)
    starts = load_field(cfg.preprocess_dir, "start_pos", "train")
    ends = load_field(cfg.preprocess_dir, "end_pos", "train")
    assert starts[0] == 1 and ends[0] == 2

    BertStage(cfg, assets["bert_params"], assets["bert_cfg"]).run()
    feats = load_field(cfg.preprocess_dir, "entity_attr_feature")
    mask = load_field(cfg.preprocess_dir, "entity_attr_mask")
    assert feats.shape == (6, cfg.max_entity_attr_token_len, 16)
    assert mask.shape == (6, cfg.max_entity_attr_token_len)
    with open(os.path.join(cfg.preprocess_dir, "qid2idx.json")) as f:
        qid2idx = json.load(f)
    assert len(qid2idx) == 6

    # entity_text_type="name": the stage embeds names only and writes the
    # name-parameterized store fields (reference loader surface,
    # baselines/data.py:100-105)
    cfg_name = cfg.replace(entity_text_type="name")
    BertStage(cfg_name, assets["bert_params"], assets["bert_cfg"]).run(splits=())
    nfeats = load_field(cfg.preprocess_dir, "entity_name_feature")
    nmask = load_field(cfg.preprocess_dir, "entity_name_mask")
    assert nfeats.shape == feats.shape and nmask.shape == mask.shape
    # names are shorter than "name. attrs" texts -> strictly fewer live tokens
    assert nmask.sum() < mask.sum()


def test_box_encode_decode_roundtrip(rng):
    from drin_tpu.ops.detection import decode_boxes, encode_boxes

    xy = rng.uniform(0, 100, (30, 2)).astype(np.float32)
    wh = rng.uniform(5, 50, (30, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    axy = rng.uniform(0, 100, (30, 2)).astype(np.float32)
    awh = rng.uniform(10, 60, (30, 2)).astype(np.float32)
    anchors = np.concatenate([axy, axy + awh], -1)
    deltas = encode_boxes(boxes, anchors)
    back = np.asarray(decode_boxes(np.asarray(deltas), anchors))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-3)
    # zero deltas decode to the anchors themselves
    zero = np.asarray(decode_boxes(np.zeros_like(deltas), anchors))
    np.testing.assert_allclose(zero, anchors, rtol=1e-5, atol=1e-3)


def test_anchor_grid():
    from drin_tpu.ops.detection import generate_anchors

    a = np.asarray(generate_anchors((2, 3), stride=16, sizes=(32,), aspect_ratios=(1.0,)))
    assert a.shape == (6, 4)
    # cell (0,0): centered 32x32 box at origin
    np.testing.assert_allclose(a[0], [-16, -16, 16, 16])
    # moving one cell right shifts by the stride in x
    np.testing.assert_allclose(a[1] - a[0], [16, 0, 16, 0])
    # moving one row down shifts by the stride in y
    np.testing.assert_allclose(a[3] - a[0], [0, 16, 0, 16])
    # aspect ratio 0.5 halves height relative to width at equal area
    b = np.asarray(generate_anchors((1, 1), stride=16, sizes=(32,), aspect_ratios=(0.5, 2.0)))
    w0, h0 = b[0, 2] - b[0, 0], b[0, 3] - b[0, 1]
    w1, h1 = b[1, 2] - b[1, 0], b[1, 3] - b[1, 1]
    assert w0 > h0 and w1 < h1
    np.testing.assert_allclose(w0 * h0, w1 * h1, rtol=0.1)  # ~equal area


def test_full_pipeline_wikimel(tmp_path):
    """WikiMEL end-to-end: prepare -> bert (global table) -> resnet (mention
    by id, entity by qid) -> clip (qid-joined sources; the reference's main()
    never covered wikimel even though training needs these files) -> dataset
    -> DRIN forward."""
    rng = np.random.default_rng(17)
    root = tmp_path
    (root / "mimg").mkdir()
    (root / "eimg").mkdir()
    qids = [f"Q{i}" for i in range(6)]
    qid2name = {q: f"name {q}" for q in qids}
    qid2attr = {q: f"attribute text for {q}. more" for q in qids}
    (root / "qid2ne.json").write_text(json.dumps(qid2name))
    (root / "qid2abs.json").write_text(json.dumps(qid2attr))
    n_cand = 2
    mentions = {
        "m1-x": {"sentence": "Alpha beta gamma delta", "mentions": "beta", "answer": "Q1"},
        "m2-x": {"sentence": "Epsilon zeta eta theta", "mentions": "zeta", "answer": "Q5"},
    }
    for split in ("train", "valid", "test"):
        (root / f"WIKIMEL_{split}.json").write_text(json.dumps(mentions))
    (root / "cands.tsv").write_text("m1-x\tQ0\tQ1\nm2-x\tQ2\tQ3")
    _write_image(root / "default.jpg", rng)
    for mid in ("m1", "m2"):
        _write_image(root / "mimg" / f"{mid}.jpg", rng)
    for q in qids[:4]:  # some entity images missing -> default fallback
        _write_image(root / "eimg" / f"{q}.jpg", rng)

    texts = [m["sentence"] for m in mentions.values()] + list(qid2attr.values()) + list(qid2name.values())
    assets = _tiny_encoders(texts)
    vocab_path = str(root / "vocab.txt")
    inv = {v: k for k, v in assets["vocab"].items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")

    cfg = tiny_config("wikimel", "drin", preprocess_dir=str(root / "store")).replace(
        num_candidates_data=n_cand,
        metrics_topk=(1,),
        bert_embed_dim=16,
        resnet_embed_dim=24,
        gcn_embed_dim=16,
        mention_final_output_dim=16,
        entity_final_output_dim=16,
        image_input_size=(64, 64),
        resnet_num_region=4,
        mention_text_path=str(root / "WIKIMEL_%s.json"),
        candidate_path=str(root / "cands.tsv"),
        qid2entity_path=str(root / "qid2ne.json"),
        qid2attr_path=str(root / "qid2abs.json"),
        mention_image_dir=str(root / "mimg"),
        entity_image_dir=str(root / "eimg"),
        default_image=str(root / "default.jpg"),
        bert_vocab=vocab_path,
        preprocess_batch_size=4,
        max_entity_attr_token_len=8,
        max_mention_sentence_len=12,
    )
    os.makedirs(cfg.preprocess_dir, exist_ok=True)

    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import BertStage, ClipStage, ResnetStage
    from tests.test_preprocess import _init_clip_stage  # self-module helper

    run_prepare(cfg)
    BertStage(cfg, assets["bert_params"], assets["bert_cfg"]).run()
    ResnetStage(cfg, assets["resnet_params"], assets["resnet_cfg"]).run()
    clip_stage = ClipStage.__new__(ClipStage)
    _init_clip_stage(clip_stage, cfg, assets)
    clip_stage.run()

    from drin_tpu.common.npy_io import load_field

    assert load_field(cfg.preprocess_dir, "similarity_miet", "train").shape == (2, n_cand + 1)
    assert load_field(cfg.preprocess_dir, "entity_image_feature", "all").shape[0] == 6

    from drin_tpu.data.dataset import create_datasets
    from drin_tpu.models.drin import DRIN

    train, valid, test = create_datasets(cfg)
    batch = next(train.batches(2, kind="drin"))
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), batch[:-1])["params"]
    scores = model.apply({"params": params}, batch[:-1])
    assert np.all(np.isfinite(np.asarray(scores)))


def test_prepare_parity_vs_reference(wd_raw, tmp_path, monkeypatch):
    """Drive the reference's WDProcess IN PLACE on the same fabricated raw
    data and require byte-identical intermediate arrays from our prepare
    stage (token positions, answers, candidate padding/append, brief join,
    md5 image resolution with fallbacks)."""
    import importlib
    import sys

    import transformers

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference

    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences + [f"{n}: a thing" for n in names])
    cfg = _wd_cfg_for(root, n_cand, tmp_path / "ours", assets)
    os.makedirs(cfg.preprocess_dir, exist_ok=True)
    from drin_tpu.common.npy_io import load_field
    from drin_tpu.preprocess.prepare import run_prepare

    run_prepare(cfg, splits=("train",))

    # configure the reference's module-level args BEFORE importing its
    # prepare module (it star-imports values at import time)
    args = load_reference("wikidiverse", "drin")
    ref_store = tmp_path / "ref"
    ref_store.mkdir()
    args.num_candidates_data = n_cand
    args.num_candidates_model = n_cand + 1
    args.max_entity_attr_char_len = cfg.max_entity_attr_char_len
    args.mention_text_path = str(root / "%s_cands.json")
    args.entity2brief_path = str(root / "brief_%s.json")
    args.entity2image_path = str(root / "entity2imgs.tsv")
    args.image_dir = str(root / "images")
    args.default_image = str(root / "default.jpg")
    args.preprocess_dir = str(ref_store)
    # zero-egress: the reference's from_pretrained("bert-base-cased") becomes
    # an HF tokenizer over the same local vocab our stage uses
    monkeypatch.setattr(
        transformers.BertTokenizer, "from_pretrained",
        classmethod(lambda cls, name, **kw: transformers.BertTokenizer(
            vocab_file=cfg.bert_vocab, do_lower_case=False)),
    )
    for m in ("preprocess", "preprocess.prepare"):
        sys.modules.pop(m, None)
    ref_prepare = importlib.import_module("preprocess.prepare")
    ref_prepare.WDProcess(ref_prepare.MentionPositionProcessor())("train")

    for field in ("mention_text_raw", "mention_image_path", "start_pos",
                  "end_pos", "answer", "entity_image_path", "entity_attr_raw"):
        ours = load_field(cfg.preprocess_dir, field, "train")
        ref = np.load(os.path.join(ref_store, field.replace("_", "-") + "_train.npy"))
        np.testing.assert_array_equal(np.asarray(ours).astype(str) if ours.dtype.kind == "U" else ours,
                                      ref.astype(str) if ref.dtype.kind == "U" else ref,
                                      err_msg=field)


def test_prepare_parity_vs_reference_wikimel(tmp_path, monkeypatch):
    """Reference WMProcess in place vs our WikiMEL prepare: byte-identical
    intermediates (substring span location + skip, candidate list + appended
    answer qid, unmatched-answer sentinel)."""
    import importlib
    import sys

    import transformers

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference

    root = tmp_path
    qids = [f"Q{i}" for i in range(6)]
    qid2name = {q: f"name {q}" for q in qids}
    qid2attr = {q: f"attribute text for {q}. more" for q in qids}
    (root / "qid2ne.json").write_text(json.dumps(qid2name))
    (root / "qid2abs.json").write_text(json.dumps(qid2attr))
    n_cand = 2
    mentions = {
        "m1-x": {"sentence": "Alpha beta gamma delta", "mentions": "beta", "answer": "Q1"},
        "m2-x": {"sentence": "Epsilon zeta eta theta", "mentions": "zeta", "answer": "Q9"},  # no match
        "m3-x": {"sentence": "No mention here at all", "mentions": "zzz", "answer": "Q0"},  # skipped
    }
    for split in ("train",):
        (root / f"WIKIMEL_{split}.json").write_text(json.dumps(mentions))
    (root / "cands.tsv").write_text("\n".join(["m1-x\tQ0\tQ1", "m2-x\tQ2\tQ3", "m3-x\tQ4\tQ5"]))

    texts = [m["sentence"] for m in mentions.values()] + list(qid2attr.values())
    assets = _tiny_encoders(texts)
    vocab_path = str(root / "vocab.txt")
    inv = {v: k for k, v in assets["vocab"].items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")
    cfg = tiny_config("wikimel", "drin", preprocess_dir=str(root / "ours")).replace(
        num_candidates_data=n_cand, metrics_topk=(1,),
        mention_text_path=str(root / "WIKIMEL_%s.json"),
        candidate_path=str(root / "cands.tsv"),
        qid2entity_path=str(root / "qid2ne.json"),
        qid2attr_path=str(root / "qid2abs.json"),
        bert_vocab=vocab_path, max_mention_sentence_len=12,
    )
    os.makedirs(cfg.preprocess_dir, exist_ok=True)
    from drin_tpu.common.npy_io import load_field
    from drin_tpu.preprocess.prepare import run_prepare

    run_prepare(cfg, splits=("train",))

    args = load_reference("wikimel", "drin")
    ref_store = root / "ref"
    ref_store.mkdir()
    args.num_candidates_data = n_cand
    args.num_candidates_model = n_cand + 1
    args.mention_text_path = str(root / "WIKIMEL_%s.json")
    args.candidate_path = str(root / "cands.tsv")
    args.preprocess_dir = str(ref_store)
    monkeypatch.setattr(
        transformers.BertTokenizer, "from_pretrained",
        classmethod(lambda cls, name, **kw: transformers.BertTokenizer(
            vocab_file=vocab_path, do_lower_case=False)),
    )
    for m in ("preprocess", "preprocess.prepare"):
        sys.modules.pop(m, None)
    ref_prepare = importlib.import_module("preprocess.prepare")
    ref_prepare.WMProcess(ref_prepare.MentionPositionProcessor())("train")

    for field in ("mention_text_raw", "entity_name_raw", "start_pos", "end_pos", "answer"):
        ours = np.asarray(load_field(cfg.preprocess_dir, field, "train"))
        ref = np.load(os.path.join(str(ref_store), field.replace("_", "-") + "_train.npy"))
        np.testing.assert_array_equal(ours.astype(str) if ours.dtype.kind == "U" else ours,
                                      ref.astype(str) if ref.dtype.kind == "U" else ref,
                                      err_msg=field)


def test_bert_stage_parity_vs_reference(tmp_path, monkeypatch):
    """BERT feature-extraction stage vs the reference's bert.py run in place
    (its TextArrayData/QidJsonData tokenize-pad semantics + feature/mask
    truncation), sharing one torch BERT: our bucketed batched stage must
    reproduce the per-item-padded-to-512 reference features to float
    tolerance, and the wikimel qid2idx mapping must be identical."""
    import importlib
    import sys

    import torch
    import transformers

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference
    from test_ghmfc_online import _tiny_hf_bert

    from drin_tpu.common.npy_io import load_field, save_field
    from drin_tpu.encoders.bert import bert_params_from_torch, config_from_torch
    from drin_tpu.preprocess.stages import BertStage
    from drin_tpu.text.wordpiece import build_tiny_vocab

    root = tmp_path
    qids = [f"Q{i}" for i in range(5)]
    qid2name = {q: f"name {q}" for q in qids}
    qid2attr = {q: f"attribute text. for {q} entity" for q in qids}
    sentences = ["Alpha beta gamma delta epsilon", "Zeta eta theta iota",
                 "One two three four five six seven"]
    (root / "qid2ne.json").write_text(json.dumps(qid2name))
    (root / "qid2abs.json").write_text(json.dumps(qid2attr))
    vocab = build_tiny_vocab(sentences + list(qid2attr.values()) + list(qid2name.values()))
    vocab_path = str(root / "vocab.txt")
    inv = {v: k for k, v in vocab.items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")

    hf_bert, hf_cfg = _tiny_hf_bert(vocab_size=len(vocab), hidden=16, max_len=64)
    sd = {k: v.numpy() for k, v in hf_bert.state_dict().items()}
    flax_cfg = config_from_torch(hf_cfg)
    params = bert_params_from_torch(sd, flax_cfg)

    ours = root / "ours"
    ours.mkdir()
    cfg = tiny_config("wikimel", "drin", preprocess_dir=str(ours)).replace(
        bert_embed_dim=16, max_bert_len=64, max_mention_sentence_len=12,
        max_entity_attr_token_len=8, bert_vocab=vocab_path,
        qid2entity_path=str(root / "qid2ne.json"), qid2attr_path=str(root / "qid2abs.json"),
        preprocess_batch_size=2)
    save_field(str(ours), "mention_text_raw", np.asarray(sentences), "train")
    BertStage(cfg, params, flax_cfg).run(splits=("train",))

    # ---- reference in place (device plumbing replaced: CPU instead of the
    # hard-coded cuda in BertInfer; the tokenize/pad/truncate semantics are
    # the reference's TextArrayData/QidJsonData classes verbatim) ----
    args = load_reference("wikimel", "drin")
    ref_store = root / "ref"
    ref_store.mkdir()
    args.preprocess_dir = str(ref_store)
    args.max_bert_len = 64
    args.max_mention_sentence_len = 12
    args.max_entity_attr_token_len = 8
    args.batch_size = 2
    args.dataloader_workers = 0
    save_field(str(ref_store), "mention_text_raw", np.asarray(sentences), "train")
    for m in ("preprocess", "preprocess.bert"):
        sys.modules.pop(m, None)
    ref_bert = importlib.import_module("preprocess.bert")
    tok = transformers.BertTokenizer(vocab_file=vocab_path, do_lower_case=False)

    def ref_infer(dataset, output_type, max_len):
        loader = torch.utils.data.DataLoader(dataset, 2, shuffle=False, num_workers=0)
        feats, masks = [], []
        with torch.no_grad():
            for batch in loader:
                out = hf_bert(**batch)[0 if output_type == "last_hidden_state" else 1]
                if output_type == "last_hidden_state":
                    feats.append(out[:, :max_len])
                    masks.append(batch["attention_mask"][:, :max_len])
                else:
                    feats.append(out)
        if output_type == "last_hidden_state":
            return torch.cat(feats).numpy(), torch.cat(masks).numpy()
        return torch.cat(feats).numpy()

    md = ref_bert.TextArrayData(tok, os.path.join(str(ref_store), "mention-text-raw_train.npy"))
    ref_feats, ref_mask = ref_infer(md, "last_hidden_state", 12)
    ed = ref_bert.QidJsonData(tok, str(root / "qid2abs.json"), qid2name)
    ed.write_mapping(os.path.join(str(ref_store), "qid2idx.json"))
    ref_ent, ref_emask = ref_infer(ed, "last_hidden_state", 8)

    np.testing.assert_array_equal(load_field(str(ours), "mention_text_mask", "train"), ref_mask)
    np.testing.assert_allclose(load_field(str(ours), "mention_text_feature", "train"),
                               ref_feats, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(load_field(str(ours), "entity_attr_feature"),
                               ref_ent, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(load_field(str(ours), "entity_attr_mask"), ref_emask)
    with open(os.path.join(str(ours), "qid2idx.json")) as f:
        ours_map = json.load(f)
    with open(os.path.join(str(ref_store), "qid2idx.json")) as f:
        ref_map = json.load(f)
    assert ours_map == ref_map


def test_preprocess_cli_module(wd_raw, tmp_path):
    """The ``python -m drin_tpu.preprocess`` CLI glue: the prepare stage runs
    from key=value overrides and writes the store; unknown stages exit."""
    from drin_tpu.common.npy_io import load_field
    from drin_tpu.preprocess.__main__ import main

    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences)
    cfg = _wd_cfg_for(root, n_cand, tmp_path / "store", assets)
    os.makedirs(cfg.preprocess_dir, exist_ok=True)
    main([
        "prepare", "dataset_name=wikidiverse",
        f"preprocess_dir={str(cfg.preprocess_dir)!r}",
        f"mention_text_path={cfg.mention_text_path!r}",
        f"entity2brief_path={cfg.entity2brief_path!r}",
        f"entity2image_path={cfg.entity2image_path!r}",
        f"image_dir={cfg.image_dir!r}",
        f"default_image={cfg.default_image!r}",
        f"bert_vocab={cfg.bert_vocab!r}",
        f"num_candidates_data={n_cand}",
    ])
    assert load_field(cfg.preprocess_dir, "answer", "train").shape == (4,)
    with pytest.raises(SystemExit, match="unknown stage"):
        main(["frobnicate"])
    with pytest.raises(SystemExit):
        main([])


def test_clip_stage_parity_vs_reference(tmp_path, monkeypatch):
    """CLIP similarity stage vs the reference's clip.py run in place: its
    MIETData/EIMTData datasets (CLIPProcessor batch-1 per mention, image
    fallbacks, candidate squeeze/unsqueeze) against our batched unique-embed
    stage with converted weights — the [N, C] miet/eimt matrices must match."""
    import importlib
    import sys

    import torch
    import transformers

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference

    from drin_tpu.common.npy_io import load_field, save_field
    from drin_tpu.encoders.clip import clip_params_from_torch, config_from_torch
    from drin_tpu.preprocess.stages import ClipStage
    from drin_tpu.text.clip_bpe import bytes_to_unicode

    rng = np.random.default_rng(33)
    root = tmp_path
    img_dir = root / "imgs"
    img_dir.mkdir()
    # square images: identical PIL bicubic resize in both pipelines
    for i in range(6):
        _write_image(img_dir / f"img{i}.jpg", rng, size=(64, 64))
    _write_image(root / "default.jpg", rng, size=(64, 64))

    N, C = 3, 3
    mention_imgs = [str(img_dir / f"img{i}.jpg") for i in range(N)]
    entity_imgs = []
    for i in range(N):
        row = [str(img_dir / f"img{(i + k) % 6}.jpg") for k in range(C)]
        row[-1] = str(img_dir / "missing.jpg")  # exercises the default fallback
        entity_imgs.extend(row)
    texts = ["the quick thing", "an entity and another", "running in there"]
    entity_texts = [f"{t} variant {k}" for t in texts for k in range(C)]

    # shared tiny vocab/merges files (pattern from test_clip_bpe_matches_hf)
    b2u = bytes_to_unicode()
    alphabet = sorted(set(b2u.values()))
    vocab = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for ch in alphabet:
        vocab[ch + "</w>"] = len(vocab)
    merges = [("t", "h"), ("th", "e</w>"), ("a", "n"), ("i", "n"), ("in", "g</w>")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vf, mf = str(root / "cvocab.json"), str(root / "cmerges.txt")
    with open(vf, "w") as f:
        json.dump(vocab, f)
    with open(mf, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))

    from transformers import (CLIPConfig as HFCLIPConfig, CLIPImageProcessor,
                              CLIPModel as HFCLIPModel, CLIPProcessor,
                              CLIPTextConfig as HFTextCfg, CLIPTokenizer as HFTok,
                              CLIPVisionConfig as HFVisionCfg)

    S = 32
    hf_cfg = HFCLIPConfig.from_text_vision_configs(
        HFTextCfg(vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=32,
                  max_position_embeddings=77, attention_dropout=0.0,
                  eos_token_id=vocab["<|endoftext|>"],
                  bos_token_id=vocab["<|startoftext|>"]),
        HFVisionCfg(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=32, image_size=S, patch_size=8,
                    attention_dropout=0.0),
        projection_dim=12,
    )
    torch.manual_seed(9)
    hf_model = HFCLIPModel(hf_cfg).eval()
    processor = CLIPProcessor(
        image_processor=CLIPImageProcessor(size={"shortest_edge": S},
                                           crop_size={"height": S, "width": S}),
        tokenizer=HFTok(vocab_file=vf, merges_file=mf, model_max_length=77),
    )

    def write_store(d):
        os.makedirs(d, exist_ok=True)
        save_field(str(d), "mention_image_path", np.asarray(mention_imgs), "train")
        save_field(str(d), "entity_image_path", np.asarray(entity_imgs), "train")
        save_field(str(d), "entity_attr_raw", np.asarray(entity_texts), "train")
        save_field(str(d), "mention_text_raw", np.asarray(texts), "train")

    # ---- ours: converted weights, batched unique-embed stage --------------
    ours = root / "ours"
    write_store(ours)
    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(ours)).replace(
        num_candidates_data=C - 1, metrics_topk=(1,), clip_vocab=vf, clip_merges=mf,
        default_image=str(root / "default.jpg"), preprocess_batch_size=4)
    flax_cfg = config_from_torch(hf_cfg)
    params = clip_params_from_torch(hf_model.state_dict(), flax_cfg)
    ClipStage(cfg, params, flax_cfg).run(splits=("train",))

    # ---- reference in place (CPU in place of the hard-coded cuda) ---------
    args = load_reference("wikidiverse", "drin")
    ref_store = root / "ref"
    write_store(ref_store)
    args.preprocess_dir = str(ref_store)
    args.num_candidates_data = C - 1
    args.num_candidates_model = C
    args.default_image = str(root / "default.jpg")
    for m in ("preprocess", "preprocess.clip"):
        sys.modules.pop(m, None)
    ref_clip = importlib.import_module("preprocess.clip")

    def ref_infer(dataset, output_type):
        loader = torch.utils.data.DataLoader(dataset, 1, shuffle=False, num_workers=0)
        feats = []
        with torch.no_grad():
            for batch in loader:
                if output_type == "logits_per_image":
                    batch["input_ids"] = ref_clip.ClipInfer.squeeze_candidates(batch["input_ids"])
                    batch["attention_mask"] = ref_clip.ClipInfer.squeeze_candidates(batch["attention_mask"])
                else:
                    batch["pixel_values"] = ref_clip.ClipInfer.squeeze_candidates(batch["pixel_values"])
                out = hf_model(**batch)
                feats.append(ref_clip.ClipInfer.unsqueeze_candidates(
                    out.logits_per_image if output_type == "logits_per_image"
                    else out.logits_per_text))
        return torch.cat(feats).numpy()

    ref_miet = ref_infer(ref_clip.MIETData(processor, "train"), "logits_per_image")
    ref_eimt = ref_infer(ref_clip.EIMTData(processor, "train"), "logits_per_text")

    np.testing.assert_allclose(load_field(str(ours), "similarity_miet", "train"),
                               ref_miet, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(load_field(str(ours), "similarity_eimt", "train"),
                               ref_eimt, rtol=2e-3, atol=2e-3)


def test_resnet_stage_parity_vs_reference(tmp_path, monkeypatch):
    """ResNet feature stage vs the reference's resnet.py run in place: its
    ImageData + FeatureProcessor (resize -> HF ConvNext processor's
    upsize+center-crop) + FeatureExtractor reshape, sharing one torch ResNet;
    our threaded batched stage with converted weights must match the
    [N, regions, C] features."""
    import importlib
    import sys

    import torch
    from transformers import ConvNextImageProcessor, ResNetConfig as HFResNetConfig, \
        ResNetModel as HFResNetModel

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference

    from drin_tpu.common.npy_io import load_field, save_field
    from drin_tpu.encoders.resnet import resnet_params_from_torch, config_from_torch
    from drin_tpu.preprocess.stages import ResnetStage

    rng = np.random.default_rng(44)
    root = tmp_path
    img_dir = root / "imgs"
    img_dir.mkdir()
    for i in range(3):
        _write_image(img_dir / f"m{i}.jpg", rng, size=(96, 80))
    _write_image(root / "default.jpg", rng, size=(64, 64))
    paths = [str(img_dir / "m0.jpg"), str(img_dir / "m1.jpg"),
             str(img_dir / "missing.jpg"), str(img_dir / "m2.jpg")]

    hf_cfg = HFResNetConfig(embedding_size=8, hidden_sizes=[8, 12, 16, 24],
                            depths=[1, 1, 1, 1])
    torch.manual_seed(11)
    hf = HFResNetModel(hf_cfg).eval()
    S = 64
    processor = ConvNextImageProcessor(
        size={"shortest_edge": S}, crop_pct=0.875,
        image_mean=[0.485, 0.456, 0.406], image_std=[0.229, 0.224, 0.225])

    # ---- ours --------------------------------------------------------------
    ours = root / "ours"
    os.makedirs(ours)
    save_field(str(ours), "mention_image_path", np.asarray(paths), "train")
    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(ours)).replace(
        image_input_size=(S, S), default_image=str(root / "default.jpg"),
        resnet_embed_dim=24, resnet_num_region=4, preprocess_batch_size=2,
        mention_object_topk=1, entity_object_topk=1)
    flax_cfg = config_from_torch(hf_cfg)
    params = resnet_params_from_torch(hf.state_dict(), flax_cfg)
    stage = ResnetStage(cfg, params, flax_cfg)
    stage.infer("train", "mention", "mention_image_feature", "", paths)
    got = load_field(str(ours), "mention_image_feature", "train")

    # ---- reference in place (CPU; its cuda plumbing replicated) ------------
    args = load_reference("wikidiverse", "drin")
    args.default_image = str(root / "default.jpg")
    args.image_input_size = (S, S)
    args.batch_size = 2
    args.num_workers = 0
    if "torchvision" not in sys.modules:  # stub the unused detector import
        import types

        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(detection=types.SimpleNamespace())
        monkeypatch.setitem(sys.modules, "torchvision", tv)
    for m in ("preprocess", "preprocess.resnet"):
        sys.modules.pop(m, None)
    ref_resnet = importlib.import_module("preprocess.resnet")
    fp = ref_resnet.FeatureProcessor(processor)
    data = torch.utils.data.DataLoader(
        ref_resnet.ImageData(fp, paths), 2, shuffle=False, num_workers=0)
    feats = []
    with torch.no_grad():
        for batch in data:
            out = hf(batch)["last_hidden_state"].numpy()
            s = out.shape
            feats.append(out.reshape(s[0], s[1], s[3] * s[2]).transpose(0, 2, 1))
    want = np.concatenate(feats, 0)

    assert got.shape == want.shape == (4, 4, 24)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_wikimel_clip_sources_parity_vs_legacy_reference(tmp_path, monkeypatch):
    """WikiMEL CLIP inputs vs the reference's legacy MIETDataWM (clip.py:30-56,
    which its main() never runs even though wikimel needs the files): the
    candidate text construction and mention-id filtering must match our
    _wikimel_sources."""
    import importlib
    import sys

    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_oracle import load_reference

    from drin_tpu.common.npy_io import save_field
    from drin_tpu.preprocess.stages import ClipStage

    root = tmp_path
    qids = [f"Q{i}" for i in range(6)]
    qid2name = {q: f"name {q}" for q in qids}
    qid2attr = {q: f"attr. of {q}" for q in qids}
    (root / "qid2ne.json").write_text(json.dumps(qid2name))
    (root / "qid2abs.json").write_text(json.dumps(qid2attr))
    mentions = {
        "m1-x": {"sentence": "Alpha beta gamma", "mentions": "beta", "answer": "Q1"},
        "m2-x": {"sentence": "Epsilon zeta eta", "mentions": "zeta", "answer": "Q3"},
        "m3-x": {"sentence": "No mention here", "mentions": "zzz", "answer": "Q0"},
    }
    (root / "WIKIMEL_train.json").write_text(json.dumps(mentions))
    store = root / "store"
    store.mkdir()
    C = 3
    rng = np.random.default_rng(3)
    qid_rows = np.array([[f"Q{rng.integers(0, 6)}" for _ in range(C)] for _ in range(2)])
    save_field(str(store), "entity_name_raw", qid_rows.reshape(-1), "train")
    save_field(str(store), "mention_text_raw",
               np.asarray([mentions["m1-x"]["sentence"], mentions["m2-x"]["sentence"]]), "train")

    cfg = tiny_config("wikimel", "drin", preprocess_dir=str(store)).replace(
        num_candidates_data=C - 1, metrics_topk=(1,),
        mention_text_path=str(root / "WIKIMEL_%s.json"),
        qid2entity_path=str(root / "qid2ne.json"),
        qid2attr_path=str(root / "qid2abs.json"),
        mention_image_dir=str(root / "mimgs"), entity_image_dir=str(root / "eimgs"))
    mention_images, entity_texts, entity_images = ClipStage._wikimel_sources(
        type("S", (), {"cfg": cfg})(), "train")

    args = load_reference("wikimel", "drin")
    args.num_candidates_data = C - 1
    args.num_candidates_model = C
    args.preprocess_dir = str(store)
    args.mention_text_path = str(root / "WIKIMEL_%s.json")
    args.qid2entity_path = str(root / "qid2ne.json")
    args.qid2attr_path = str(root / "qid2abs.json")
    args.mention_image_dir = str(root / "mimgs")
    args.entity_image_dir = str(root / "eimgs")
    for m in ("preprocess", "preprocess.clip"):
        sys.modules.pop(m, None)
    ref_clip = importlib.import_module("preprocess.clip")

    captured = []

    class Cap:
        def __call__(self, text=None, images=None, return_tensors=None, padding=None):
            captured.append(text)
            z = torch.zeros(len(text) if isinstance(text, list) else 1, 2, dtype=torch.long)
            return {"input_ids": z, "attention_mask": z.clone()}

    # the legacy loader opens mention images; route to a stand-in default
    _write_image(root / "default.jpg", np.random.default_rng(0), size=(64, 64))
    args.default_image = str(root / "default.jpg")
    monkeypatch.setattr(ref_clip, "default_image", str(root / "default.jpg"))
    md = ref_clip.MIETDataWM(Cap(), "train")
    assert len(md) == 2 == len(mention_images)  # m3 filtered identically
    for i in range(len(md)):
        md[i]
    np.testing.assert_array_equal(np.asarray(captured, dtype=object),
                                  np.asarray(entity_texts, dtype=object))


def test_resnet_stage_with_frcnn_detector_pipeline(tmp_path):
    """The composition the reference always runs (resnet.py:144-162) with a
    REAL converted detector: FRCNNDetector (random torch-layout weights via
    the checkpoint-conversion path) -> detect -> crop -> re-encode -> .npy
    store.  Previously only the bare FasterRCNN module was tested."""
    import torch

    from drin_tpu.preprocess.detector import FRCNNDetector, make_detector
    from drin_tpu.preprocess.stages import ResnetStage
    from tests.test_frcnn import TINY, _fabricate_torchvision_sd

    rng = np.random.default_rng(21)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        _write_image(p, rng, size=(72, 56))
        paths.append(str(p))
    _write_image(tmp_path / "default.jpg", rng)
    ckpt = str(tmp_path / "frcnn.pt")
    torch.save({k: torch.as_tensor(v)
                for k, v in _fabricate_torchvision_sd(TINY, new_style=True).items()}, ckpt)

    assets = _tiny_encoders(["some text"])
    store = tmp_path / "store"
    os.makedirs(store)
    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(store)).replace(
        resnet_embed_dim=24, image_input_size=(64, 64), resnet_num_region=4,
        default_image=str(tmp_path / "default.jpg"), preprocess_batch_size=2,
        detector_checkpoint=ckpt)
    det = make_detector(cfg, frcnn_cfg=TINY)
    assert isinstance(det, FRCNNDetector)  # checkpoint selected the real one
    stage = ResnetStage(cfg, assets["resnet_params"], assets["resnet_cfg"],
                        detector=det)
    stage.infer("train", "mention", "last_hidden_state", "pooler_output", paths)

    from drin_tpu.common.npy_io import load_field

    feats = load_field(str(store), "mention_image_feature", "train")
    scores = load_field(str(store), "mention_object_score", "train")
    objs = load_field(str(store), "mention_object_feature", "train")
    K = cfg.object_topk["mention"]
    assert feats.shape == (3, 4, 24) and np.all(np.isfinite(feats))
    assert scores.shape == (3, K) and np.all(scores >= 0) and np.all(scores <= 1)
    assert objs.shape == (3, K, 1, 24) and np.all(np.isfinite(objs))
    # detector boxes are in RESIZED (image_input_size) coordinates while the
    # crop stage applies them to the original image — the reference's quirk
    # (resnet.py:79-84 resizes before detection; ImageRegionData crops the
    # original), preserved here (preprocess/detector.py module docstring)
    boxes, s = stage.detect(paths, K)
    assert boxes.shape == (3, K, 4)
    found = s > 0
    assert found.any(), "random-weight detector found no boxes (seed-dependent)"
    fb = boxes[found]
    assert np.all(fb >= 0) and np.all(fb <= 64 + 1e-3)


def test_whole_image_detector_stub_warns_loudly(tmp_path, capsys):
    """Falling back to the stub detector must be impossible to miss: a
    warning AND a stderr line (the reference always runs a real pretrained
    Faster R-CNN, resnet.py:134-141)."""
    import warnings

    from drin_tpu.preprocess.detector import WholeImageDetector, make_detector

    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(tmp_path))
    assert not cfg.detector_checkpoint
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        det = make_detector(cfg)
    assert isinstance(det, WholeImageDetector)
    assert any("WholeImageDetector" in str(x.message) for x in w)
    assert "WholeImageDetector" in capsys.readouterr().err


def test_clip_stage_resumable(wd_raw, tmp_path):
    """ClipStage skips any split whose similarity files already exist — the
    reference's resumability contract (clip.py:163-169).  A second run must
    embed nothing and leave the files byte-identical."""
    from drin_tpu.preprocess.prepare import run_prepare
    from drin_tpu.preprocess.stages import BertStage, ClipStage

    root, sentences, names, n_cand = wd_raw
    assets = _tiny_encoders(sentences + [f"{n}: a thing" for n in names])
    cfg = _wd_cfg_for(root, n_cand, tmp_path / "store", assets)
    os.makedirs(cfg.preprocess_dir, exist_ok=True)
    run_prepare(cfg)
    stage = ClipStage.__new__(ClipStage)
    _init_clip_stage(stage, cfg, assets)
    stage.run()
    sim_files = sorted(f for f in os.listdir(cfg.preprocess_dir)
                       if f.startswith("similarity"))
    assert len(sim_files) == 6  # miet + eimt x 3 splits
    before = {f: open(os.path.join(cfg.preprocess_dir, f), "rb").read()
              for f in sim_files}

    def _explode(*a, **k):
        raise AssertionError("resumable run re-embedded")

    stage._embed_images = _explode
    stage._embed_texts = _explode
    stage.run()  # all outputs exist: must not touch the encoders
    after = {f: open(os.path.join(cfg.preprocess_dir, f), "rb").read()
             for f in sim_files}
    assert before == after


def test_clip_preprocess_matches_hf_processor_nonsquare():
    """clip_preprocess must be pixel-exact vs transformers'
    CLIPImageProcessor for NON-square inputs whose aspect fraction is >= .5:
    HF computes the long resized edge with int() truncation
    (get_resize_output_image_size), and a round() there shifts the center
    crop by a pixel — 70x48 at size 32 gives long edge int(46.67) = 46, not
    47 (square fixtures can never catch this)."""
    from PIL import Image
    from transformers import CLIPImageProcessor

    from drin_tpu.preprocess.images import clip_preprocess

    rng = np.random.default_rng(3)
    for (w, h) in [(70, 48), (48, 70), (640, 480), (97, 101)]:
        img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
        size = 32
        hf = CLIPImageProcessor(size={"shortest_edge": size},
                                crop_size={"height": size, "width": size})
        want = hf(img, return_tensors="np")["pixel_values"][0]  # [3, s, s]
        got = clip_preprocess(img, size)                        # [s, s, 3]
        np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                                   rtol=1e-5, atol=1e-5)


def test_bert_stage_streaming_writer_matches_in_ram(tmp_path):
    """``encode_texts_npy`` streams byte-identical features/masks to the
    in-RAM ``encode_texts``, one dispatch chunk at a time through NpyWriter
    (review finding: the WikiMEL global entity pass is >20GB at production
    scale and must never accumulate on the host the way the reference's
    torch.cat does, bert.py:72-83 — its readme demands 100GB+ RAM for it,
    readme.md:22)."""
    from drin_tpu.preprocess.stages import BertStage

    sentences = [f"alpha beta b{i} gamma delta" for i in range(13)]
    assets = _tiny_encoders(sentences)
    vocab_path = str(tmp_path / "vocab.txt")
    inv = {v: k for k, v in assets["vocab"].items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")
    cfg = tiny_config("wikidiverse", "drin",
                      preprocess_dir=str(tmp_path / "store")).replace(
        bert_embed_dim=16, bert_vocab=vocab_path,
        preprocess_batch_size=4,  # 13 rows -> 4 dispatch chunks
        max_mention_sentence_len=12)
    stage = BertStage(cfg, assets["bert_params"], assets["bert_cfg"])

    want_f, want_m = stage.encode_texts(sentences, "last_hidden_state", 12)
    fp, mp = str(tmp_path / "f.npy"), str(tmp_path / "m.npy")
    stage.encode_texts_npy(sentences, "last_hidden_state", 12, fp, mp)
    np.testing.assert_array_equal(np.load(fp), want_f)
    np.testing.assert_array_equal(np.load(mp), want_m)

    want_p = stage.encode_texts(sentences, "pooler_output", 12)
    pp = str(tmp_path / "p.npy")
    stage.encode_texts_npy(sentences, "pooler_output", 12, pp)
    np.testing.assert_array_equal(np.load(pp), want_p)
