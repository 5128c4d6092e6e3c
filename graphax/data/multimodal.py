"""Multimodal / image-grid datasets and loaders.

Twin of `src/data_multi.py` + the presets in `src/run_multi.py:19-66`:
MNIST/CIFAR pixel-grid diffusion datasets and a CLEVR-style multimodal
dataset (image grid graph + question chain graph + answer labels) with an
HDF5 precompute cache. Zero-egress substitutions: MNIST/CIFAR parse the
standard idx/pickle raw files when present under ``data_dir`` and fall back
to synthetic digits; the CLEVR feature extractors (ResNet-101 patches, BERT
token embeddings — `src/data_multi.py:201-284`) become deterministic random
projections of raw patches/token ids with identical shapes so the whole
pipeline (HDF5 chunks, batching, cross-modal attention) is exercised
end-to-end.
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import struct
from typing import Iterator, Optional, Tuple

import numpy as np

from graphax.data.grids import chain_edge_index, grid_edge_index
from graphax.sparse import build
from graphax.sparse.graph import Graph


# ----------------------------------------------------------------------
# Presets (`run_multi.py:19-66`)
# ----------------------------------------------------------------------

MULTIMODAL_PRESETS = {
    "MNIST": dict(im_width=28, im_height=28, im_chan=1, hidden_dim=1,
                  num_class=10, input_dropout=0.5, dropout=0.0,
                  optimizer="rmsprop", lr=0.0047, decay=5e-4,
                  self_loop_weight=0.555, time=1.0, batch_size=4,
                  train_size=32, test_size=512, diags=True),
    "CIFAR": dict(im_width=32, im_height=32, im_chan=3, hidden_dim=3,
                  num_class=10, input_dropout=0.5, dropout=0.0,
                  optimizer="rmsprop", lr=0.0047, decay=5e-4,
                  self_loop_weight=0.555, time=1.0, batch_size=4,
                  train_size=32, test_size=512, diags=True),
    "CLEVR": dict(grid=14, feat_dim=64, text_dim=32, max_question_len=16,
                  num_class=28, batch_size=4, time=1.0,
                  self_loop_weight=1.0),
}


def multimodal_config(name: str, **overrides):
    from graphax.train.config import Config

    p = dict(MULTIMODAL_PRESETS[name])
    p.update(overrides)
    cfg_keys = {f.name for f in dataclasses.fields(Config)}
    return (Config(**{k: v for k, v in p.items() if k in cfg_keys}),
            {k: v for k, v in p.items() if k not in cfg_keys})


# ----------------------------------------------------------------------
# Image datasets
# ----------------------------------------------------------------------

def _load_mnist_raw(data_dir: str):
    """Parse the standard idx-format MNIST files if present."""
    def read_images(path):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            _, n, h, w = struct.unpack(">IIII", f.read(16))
            return np.frombuffer(f.read(), np.uint8).reshape(n, h, w)

    def read_labels(path):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            _, n = struct.unpack(">II", f.read(8))
            return np.frombuffer(f.read(), np.uint8)

    for sub in ("MNIST/raw", "mnist", "."):
        base = os.path.join(data_dir, sub)
        for ext in ("", ".gz"):
            p = os.path.join(base, "train-images-idx3-ubyte" + ext)
            if os.path.exists(p):
                xs = read_images(p)
                ys = read_labels(os.path.join(
                    base, "train-labels-idx1-ubyte" + ext))
                return xs, ys
    return None


def _synthetic_digits(n: int, h: int, w: int, chan: int, num_class: int,
                      seed: int):
    """Class-conditional blob images — hermetic MNIST/CIFAR stand-in whose
    classification genuinely requires reading the pixels."""
    rng = np.random.RandomState(seed)
    ys = rng.randint(0, num_class, n)
    yy, xx = np.mgrid[0:h, 0:w]
    xs = np.zeros((n, h, w, chan), np.float32)
    for i, c in enumerate(ys):
        cx = (c + 1) / (num_class + 1) * w
        cy = h / 2 + (c % 2) * h / 6 - h / 12
        blob = np.exp(-(((xx - cx) ** 2) + (yy - cy) ** 2)
                      / (2 * (w / 8) ** 2))
        xs[i] = blob[..., None] + 0.1 * rng.randn(h, w, chan)
    return xs, ys


@dataclasses.dataclass(frozen=True)
class PixelGraphDataset:
    """Images as grid-graph node features: x [B, N_pixels, C]."""

    graph: Graph
    x: np.ndarray
    y: np.ndarray
    num_classes: int
    height: int
    width: int

    def batches(self, batch_size: int, seed: int = 0, train: bool = True
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self.y))
        if train:
            np.random.RandomState(seed).shuffle(idx)
        for s in range(0, len(idx) - batch_size + 1, batch_size):
            sel = idx[s:s + batch_size]
            yield self.x[sel], self.y[sel]


def get_image_dataset(name: str, data_dir: str = "./data",
                      size: Optional[int] = None, diags: bool = True,
                      self_loop_weight: float = 0.555, seed: int = 0
                      ) -> PixelGraphDataset:
    """MNIST/CIFAR as pixel-grid diffusion data (`run_multi.py` pipeline)."""
    preset = MULTIMODAL_PRESETS[name]
    h, w, chan = preset["im_height"], preset["im_width"], preset["im_chan"]
    nc = preset["num_class"]
    raw = _load_mnist_raw(data_dir) if name == "MNIST" else None
    if raw is not None:
        xs, ys = raw
        xs = xs[..., None].astype(np.float32) / 255.0
    else:
        xs, ys = _synthetic_digits(size or 1024, h, w, chan, nc, seed)
    if size is not None:
        xs, ys = xs[:size], ys[:size]
    row, col = grid_edge_index(h, w, diagonals=diags)
    graph = build.build_graph(row, col, h * w,
                              self_loop_weight=self_loop_weight)
    x = xs.reshape(xs.shape[0], h * w, chan)
    return PixelGraphDataset(graph=graph, x=x.astype(np.float32),
                             y=ys.astype(np.int64), num_classes=nc,
                             height=h, width=w)


# ----------------------------------------------------------------------
# CLEVR-style multimodal dataset with HDF5 precompute
# ----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MultimodalGraphDataset:
    """CLEVR-style VQA: image grid features + question chain features.

    ``__getitem__``-equivalent contract of the reference CLEVR_v1
    (`src/data_multi.py:326-428`): per sample a dict with modality data
    (image grid features, question token features), the two graphs, and the
    answer label. (The reference's dict key typo 'modility_graphs' —
    SURVEY §8 — is not reproduced.)"""

    image_graph: Graph
    text_graph: Graph
    images: np.ndarray      # [B, g², feat_dim]
    questions: np.ndarray   # [B, L, text_dim]
    answers: np.ndarray     # [B]
    num_classes: int
    # per-sample real question lengths (the reference stores one q_graph
    # PER QUESTION, `src/data_multi.py:376` `q_graph [B, 2, max_tokens-1]`);
    # None → every chain is max length and `text_graph` is exact
    question_lengths: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.answers)

    def __getitem__(self, i):
        tg = self.text_graph
        if self.question_lengths is not None:
            import jax

            stacked = batched_chain_graphs(self.question_lengths[i:i + 1],
                                           self.questions.shape[1])
            # per-sample item contract: an UNBATCHED Graph (squeeze the
            # stacking axis), like image_graph in the same list
            tg = jax.tree_util.tree_map(lambda a: a[0], stacked)
        return {
            "modality_data": [self.images[i], self.questions[i]],
            "modality_graphs": [self.image_graph, tg],
            "additional_data": None,
            "labels": self.answers[i],
        }

    def batches(self, batch_size: int, seed: int = 0):
        idx = np.random.RandomState(seed).permutation(len(self))
        for s in range(0, len(self) - batch_size + 1, batch_size):
            sel = idx[s:s + batch_size]
            yield (self.images[sel], self.questions[sel],
                   self.answers[sel], sel)

    def text_graphs_for(self, sel) -> Graph:
        """Stacked per-sample chain graphs for a batch index array —
        the reference's `[B, 2, E]` per-question edge lists as a
        leading-axis-stacked Graph to `jax.vmap` over."""
        if self.question_lengths is None:
            lens = np.full(len(np.atleast_1d(sel)),
                           self.questions.shape[1], np.int64)
        else:
            lens = self.question_lengths[sel]
        return batched_chain_graphs(lens, self.questions.shape[1])


def batched_chain_graphs(lengths, max_len: int,
                         self_loop_weight: float = 1.0) -> Graph:
    """Per-sample chain graphs, stacked on a leading batch axis.

    The reference builds one chain edge list PER question
    (`src/utils.py:16-42` make_graph, `src/data_multi.py:192-197,376`) so a
    batch carries `[B, 2, E]` with each sample's own length. TPU-shape
    realization: every sample's graph lives in the SAME static buffers
    (num_nodes = max_len, shared edge capacity); sample s has chain edges
    over its first ``lengths[s]`` tokens (+ self-loops on those tokens),
    real-edge prefix masked by ``num_edges``. The stacked Graph pytree
    vmaps over the leading axis (Graph arrays are leaves; num_nodes /
    strategy are static and identical)."""
    import jax
    import jax.numpy as jnp

    lengths = np.atleast_1d(np.asarray(lengths, np.int64))
    graphs = []
    for ln in lengths:
        ln = int(max(min(ln, max_len), 1))
        src, dst = chain_edge_index(ln)
        # shared static buffer across the batch: self-loops land on ALL
        # max_len nodes (build.add_self_loops), chain edges on the first
        # ln, so capacity = 2(max_len-1) + max_len for every sample
        g = build.build_graph(src, dst, max_len,
                              self_loop_weight=self_loop_weight,
                              pad_multiple=1, strategy="edge",
                              extra_edge_capacity=2 * (max_len - ln))
        graphs.append(g)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)


def build_clevr_style_dataset(num_samples: int = 64, grid: int = 14,
                              feat_dim: int = 64, text_dim: int = 32,
                              max_question_len: int = 16,
                              num_classes: int = 28,
                              cache_path: Optional[str] = None,
                              data_dir: Optional[str] = None,
                              seed: int = 0) -> MultimodalGraphDataset:
    """Build (or load) the precomputed HDF5 with image-grid features,
    question features, and answers — the shape/layout of the reference's
    CLEVR precompute (`images [N, g², feat]`, chunked). When real
    extractor checkpoints are staged under ``data_dir`` (a torchvision
    resnet101 ``.pth`` / a HuggingFace text model dir — see
    `graphax.data.extractors`), patch and token features come from those
    weights; otherwise deterministic random projections keep the pipeline
    hermetic."""
    import h5py

    from graphax.data.extractors import (ImageFeatureExtractor,
                                         TextFeatureExtractor)

    if cache_path and os.path.exists(cache_path):
        with h5py.File(cache_path, "r") as f:
            images = f["images"][:]
            questions = f["questions"][:]
            answers = f["answers"][:]
            q_lens = (f["question_lengths"][:]
                      if "question_lengths" in f else None)
    else:
        rng = np.random.RandomState(seed)
        img_ex = ImageFeatureExtractor(feat_dim, grid=grid,
                                       data_dir=data_dir, seed=seed)
        txt_ex = TextFeatureExtractor(text_dim, vocab_size=100,
                                      data_dir=data_dir, seed=seed)
        if img_ex.using_real_weights:
            # the ResNet trunk downsamples 16x to reach the g x g patch grid
            raw_imgs = rng.rand(num_samples, grid * 16, grid * 16, 3) \
                .astype(np.float32)
        else:
            raw_imgs = rng.rand(num_samples, grid, grid, 3).astype(np.float32)
        images = img_ex(raw_imgs)
        # variable question lengths — the reference stores ONE chain graph
        # per question (`src/data_multi.py:376` q_graph [B, 2, E]); token
        # positions past a question's length are zero padding
        q_lens = rng.randint(max(max_question_len // 2, 2),
                             max_question_len + 1, num_samples)
        token_ids = rng.randint(0, 100, (num_samples, max_question_len))
        questions = txt_ex(token_ids)
        pad = np.arange(max_question_len)[None, :] >= q_lens[:, None]
        questions = np.where(pad[:, :, None], 0.0, questions)
        # answers depend on both modalities so VQA training is meaningful
        answers = ((raw_imgs.mean(axis=(1, 2, 3)) * 10).astype(np.int64)
                   + token_ids[:, 0] // 10) % num_classes
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with h5py.File(cache_path, "w") as f:
                f.create_dataset("images", data=images,
                                 chunks=(min(16, num_samples),
                                         grid * grid, feat_dim))
                f.create_dataset("questions", data=questions)
                f.create_dataset("answers", data=answers)
                f.create_dataset("question_lengths", data=q_lens)

    ig_row, ig_col = grid_edge_index(grid, grid, diagonals=False)
    image_graph = build.build_graph(ig_row, ig_col, grid * grid,
                                    self_loop_weight=1.0)
    tg_row, tg_col = chain_edge_index(max_question_len)
    text_graph = build.build_graph(tg_row, tg_col, max_question_len,
                                   self_loop_weight=1.0)
    return MultimodalGraphDataset(
        image_graph=image_graph, text_graph=text_graph,
        images=np.asarray(images, np.float32),
        questions=np.asarray(questions, np.float32),
        answers=np.asarray(answers, np.int64), num_classes=num_classes,
        question_lengths=(np.asarray(q_lens, np.int64)
                          if q_lens is not None else None))
