"""Real-CLEVR ingestion: extracted-zip layout → chunked HDF5 → training.

A miniature CLEVR_v1.0 directory (real PNGs, the reference question-JSON
schema `src/data_multi.py:369-390`) is synthesized on disk, streamed
through `graphax.data.clevr.build_clevr_hdf5`, loaded as a ClevrDataset,
and driven through one multimodal training epoch — the full path a user
runs after `scripts/fetch_data.py --only clevr`.
"""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
PIL = pytest.importorskip("PIL")

from PIL import Image

from graphax.data.clevr import (
    build_answer_vocab, build_clevr_hdf5, build_token_vocab, h5_path,
    load_clevr, tokenize,
)

GRID, FEAT, TEXT, QLEN = 4, 6, 8, 12

QUESTIONS = [
    {"image_index": 0, "question": "What color is the large cube?",
     "answer": "red", "image_filename": "CLEVR_train_000000.png"},
    {"image_index": 0, "question": "How many spheres are there?",
     "answer": "2", "image_filename": "CLEVR_train_000000.png"},
    {"image_index": 1, "question": "Is the cylinder shiny?",
     "answer": "yes", "image_filename": "CLEVR_train_000001.png"},
    {"image_index": 2, "question": "What color is the small sphere?",
     "answer": "blue", "image_filename": "CLEVR_train_000002.png"},
    {"image_index": 3, "question": "How many cubes are red?",
     "answer": "2", "image_filename": "CLEVR_train_000003.png"},
]


def _stage_mini_clevr(root, split="train", n_img=4):
    img_dir = os.path.join(root, "CLEVR_v1.0", "images", split)
    q_dir = os.path.join(root, "CLEVR_v1.0", "questions")
    os.makedirs(img_dir)
    os.makedirs(q_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_img):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"CLEVR_{split}_{i:06d}.png"))
    qs = QUESTIONS if split == "train" else [
        {k: v for k, v in q.items() if k != "answer"} for q in QUESTIONS]
    with open(os.path.join(q_dir, f"CLEVR_{split}_questions.json"),
              "w") as f:
        json.dump({"questions": qs}, f)


def test_tokenizer_and_vocabs():
    assert tokenize("What color is the cube?") == \
        ["what", "color", "is", "the", "cube", "?"]
    vocab = build_token_vocab(QUESTIONS)
    assert 0 not in vocab.values()          # 0 reserved for PAD/UNK
    assert len(set(vocab.values())) == len(vocab)
    assert build_answer_vocab(QUESTIONS) == ["2", "blue", "red", "yes"]


def test_build_and_load_roundtrip(tmp_path):
    root = str(tmp_path)
    _stage_mini_clevr(root)
    kw = dict(grid=GRID, feat_dim=FEAT, text_dim=TEXT,
              max_question_len=QLEN, batch_size=2)
    path = build_clevr_hdf5(root, "train", **kw)
    assert path == h5_path(root, "train")
    with h5py.File(path, "r") as f:
        assert f["images"].shape == (4, GRID * GRID, FEAT)
        assert f["questions"].shape == (5, QLEN, TEXT)
        assert list(f["image_indices"][:]) == [0, 0, 1, 2, 3]
        assert f.attrs["num_classes"] == 4
        # answers resolve through the sorted train answer vocab
        assert list(f["answers"][:]) == [2, 0, 3, 1, 0]
        lens = f["question_lengths"][:]
        assert (lens > 0).all() and (lens <= QLEN).all()
        # padding past each question's length is zeroed
        q0 = f["questions"][0]
        assert np.abs(q0[lens[0]:]).max() == 0
        assert np.abs(q0[:lens[0]]).max() > 0
    # idempotent: second call reuses the HDF5
    assert build_clevr_hdf5(root, "train", **kw) == path

    ds = load_clevr(root, "train", build_kwargs=kw)
    assert len(ds) == 5
    assert ds.images.shape == (4, GRID * GRID, FEAT)
    assert ds.num_classes == 4
    # several questions share image 0 through the index indirection
    item0, item1 = ds[0], ds[1]
    np.testing.assert_array_equal(item0["modality_data"][0],
                                  item1["modality_data"][0])
    xb, qb, yb, sel = next(ds.batches(4, seed=0))
    assert xb.shape == (4, GRID * GRID, FEAT)
    assert qb.shape == (4, QLEN, TEXT)


def test_val_split_reuses_train_vocab(tmp_path):
    root = str(tmp_path)
    _stage_mini_clevr(root, "train")
    _stage_mini_clevr(root, "val")
    kw = dict(grid=GRID, feat_dim=FEAT, text_dim=TEXT,
              max_question_len=QLEN, batch_size=2)
    build_clevr_hdf5(root, "train", **kw)
    build_clevr_hdf5(root, "val", **kw)
    with open(h5_path(root, "train") + ".vocab.json") as f:
        train_voc = json.load(f)
    with h5py.File(h5_path(root, "val"), "r") as f:
        # val split carries the train answer-vocab size; no answers dataset
        assert f.attrs["num_classes"] == len(train_voc["answers"])
        assert "answers" not in f


def test_real_clevr_training_epoch(tmp_path):
    from graphax.drivers.run_multi import train_clevr_style

    root = str(tmp_path)
    _stage_mini_clevr(root)
    kw = dict(grid=GRID, feat_dim=FEAT, text_dim=TEXT,
              max_question_len=QLEN, batch_size=2)
    out = train_clevr_style(epochs=2, batch_size=2, data_dir=root,
                            real_clevr=True, build_kwargs=kw, log=False)
    losses = [h["loss"] for h in out["history"]]
    assert np.isfinite(losses).all()


def test_getitem_beyond_image_count_and_lazy(tmp_path):
    """Review r4: __getitem__ must work for question indices past the
    deduplicated image count (several questions per image), and lazy
    loading must serve identical batches from the open HDF5."""
    root = str(tmp_path)
    _stage_mini_clevr(root, n_img=2)   # 5 questions share 2 images
    kw = dict(grid=GRID, feat_dim=FEAT, text_dim=TEXT,
              max_question_len=QLEN, batch_size=2)
    # only keep questions whose image exists in the truncated image list
    ds = load_clevr(root, "train",
                    build_kwargs=dict(max_images=2, **kw))
    assert len(ds) == 3                     # questions on images 0 and 1
    item_last = ds[len(ds) - 1]             # index >= n_images
    np.testing.assert_array_equal(
        item_last["modality_data"][0],
        ds.images[int(ds.image_indices[len(ds) - 1])])

    lazy = load_clevr(root, "train", lazy=True,
                      build_kwargs=dict(max_images=2, **kw))
    assert not isinstance(lazy.images, np.ndarray)
    xb_l, qb_l, yb_l, sel_l = next(lazy.batches(3, seed=1))
    xb_e, qb_e, yb_e, sel_e = next(ds.batches(3, seed=1))
    np.testing.assert_array_equal(sel_l, sel_e)
    np.testing.assert_allclose(xb_l, xb_e)
    np.testing.assert_allclose(qb_l, qb_e)
    item_lazy = lazy[len(lazy) - 1]
    np.testing.assert_allclose(item_lazy["modality_data"][0],
                               item_last["modality_data"][0])


def test_val_build_without_train_h5_uses_train_vocab(tmp_path):
    """Review r4: building val BEFORE train must anchor vocabularies to
    the raw train questions (never the val split's own answers)."""
    root = str(tmp_path)
    _stage_mini_clevr(root, "train")
    _stage_mini_clevr(root, "val")
    kw = dict(grid=GRID, feat_dim=FEAT, text_dim=TEXT,
              max_question_len=QLEN, batch_size=2)
    build_clevr_hdf5(root, "val", **kw)     # train h5 does NOT exist yet
    with h5py.File(h5_path(root, "val"), "r") as f:
        # train answer vocab: ["2", "blue", "red", "yes"]
        assert f.attrs["num_classes"] == 4

    # and with no train questions either, the build refuses loudly
    import shutil

    shutil.rmtree(os.path.join(root, "CLEVR_v1.0", "questions"))
    os.remove(h5_path(root, "val"))
    _stage_mini_clevr_questions_only(root, "val")
    with pytest.raises(FileNotFoundError, match="train"):
        build_clevr_hdf5(root, "val", **kw)


def _stage_mini_clevr_questions_only(root, split):
    q_dir = os.path.join(root, "CLEVR_v1.0", "questions")
    os.makedirs(q_dir, exist_ok=True)
    qs = [{k: v for k, v in q.items() if k != "answer"} for q in QUESTIONS]
    with open(os.path.join(q_dir, f"CLEVR_{split}_questions.json"),
              "w") as f:
        json.dump({"questions": qs}, f)


def test_empty_image_dir_raises(tmp_path):
    root = str(tmp_path)
    _stage_mini_clevr(root)
    kw = dict(grid=GRID, feat_dim=FEAT, text_dim=TEXT,
              max_question_len=QLEN, batch_size=2)
    with pytest.raises(FileNotFoundError, match="no .png images"):
        build_clevr_hdf5(root, "train", max_images=0, **kw)
