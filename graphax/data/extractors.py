"""CLEVR feature extractors — real checkpoints when present, hermetic
stand-ins otherwise.

The reference precomputes CLEVR image features with a torchvision ResNet-101
trunk (conv4 / layer3 output, 14x14x1024) and question features with BERT
token embeddings (`src/data_multi.py:201-284`). This environment has no
egress and no torchvision, so:

- ``ImageFeatureExtractor`` implements the ResNet-101 trunk **in JAX**
  (NHWC convs on the MXU) and loads a torchvision-format ``.pth`` state
  dict (``resnet101-*.pth``) when one is staged under the data dir — the
  same "use raw files if present" contract as the dataset loaders. Without
  a checkpoint it falls back to the deterministic random patch projection.
- ``TextFeatureExtractor`` loads any local HuggingFace checkpoint directory
  via ``transformers`` (``local_files_only=True``) and uses its token
  embedding table; otherwise a deterministic random vocab table.

Both produce the exact shapes the multimodal pipeline consumes, so the
HDF5 precompute / batching / cross-modal attention path is identical with
or without real weights.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


# ----------------------------------------------------------------------
# JAX ResNet-101 trunk (torchvision state-dict layout)
# ----------------------------------------------------------------------

# torchvision resnet101: blocks per stage; CLEVR uses the layer3 output
RESNET101_STAGES = (3, 4, 23, 3)


def _conv(x, w, stride=1):
    """NHWC conv with torch OIHW weights; 'SAME'-style torch padding
    (pad = k//2 for the 3x3/7x7 convs, 0 for 1x1)."""
    import jax.lax as lax

    k = w.shape[2]
    pad = k // 2
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))


def _bn(x, params, prefix, eps=1e-5):
    import jax.numpy as jnp

    g = params[prefix + ".weight"]
    b = params[prefix + ".bias"]
    m = params[prefix + ".running_mean"]
    v = params[prefix + ".running_var"]
    inv = g / jnp.sqrt(v + eps)
    return x * inv + (b - m * inv)


def _bottleneck(x, params, prefix, stride):
    import jax

    out = _conv(x, params[prefix + ".conv1.weight"])
    out = jax.nn.relu(_bn(out, params, prefix + ".bn1"))
    out = _conv(out, params[prefix + ".conv2.weight"], stride=stride)
    out = jax.nn.relu(_bn(out, params, prefix + ".bn2"))
    out = _conv(out, params[prefix + ".conv3.weight"])
    out = _bn(out, params, prefix + ".bn3")
    if (prefix + ".downsample.0.weight") in params:
        sc = _conv(x, params[prefix + ".downsample.0.weight"], stride=stride)
        sc = _bn(sc, params, prefix + ".downsample.1")
    else:
        sc = x
    return jax.nn.relu(out + sc)


def resnet_trunk(x, params, stages=RESNET101_STAGES, out_stage=3):
    """Forward the torchvision-resnet trunk through ``out_stage`` stages.

    x: [B, H, W, 3] float32 (ImageNet-normalized). Returns NHWC features —
    for a 224x224 input and out_stage=3 that is [B, 14, 14, 1024], the
    CLEVR patch-feature layout of the reference (`src/data_multi.py:201`).
    """
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    out = _conv(x, params["conv1.weight"], stride=2)
    out = jax.nn.relu(_bn(out, params, "bn1"))
    # torch MaxPool2d(3, stride=2, padding=1)
    out = lax.reduce_window(out, -jnp.inf, lax.max, (1, 3, 3, 1),
                            (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for s in range(out_stage):
        blocks = stages[s]
        for i in range(blocks):
            stride = 2 if (s > 0 and i == 0) else 1
            out = _bottleneck(out, params, f"layer{s + 1}.{i}", stride)
    return out


def load_torch_state_dict(path: str) -> dict:
    """Load a torch ``.pth`` state dict into a name->np.ndarray dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy(), np.float32)
            for k, v in sd.items() if hasattr(v, "detach")}


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def find_resnet_checkpoint(data_dir: str) -> Optional[str]:
    for cand_dir in (os.path.join(data_dir, "checkpoints"), data_dir):
        if not os.path.isdir(cand_dir):
            continue
        for f in sorted(os.listdir(cand_dir)):
            if f.startswith("resnet101") and f.endswith(".pth"):
                return os.path.join(cand_dir, f)
    return None


class ImageFeatureExtractor:
    """ResNet-101 layer3 patch features when a checkpoint is staged,
    deterministic random projection otherwise. Output: [B, grid², feat_dim].
    """

    def __init__(self, feat_dim: int, grid: int = 14,
                 data_dir: Optional[str] = None,
                 checkpoint: Optional[str] = None, seed: int = 0):
        self.feat_dim = feat_dim
        self.grid = grid
        self.seed = seed
        if checkpoint is None and data_dir is not None:
            checkpoint = find_resnet_checkpoint(data_dir)
        self.checkpoint = checkpoint
        self._params = None
        self._proj = None

    @property
    def using_real_weights(self) -> bool:
        return self.checkpoint is not None

    def _resnet_params(self):
        if self._params is None:
            self._params = load_torch_state_dict(self.checkpoint)
        return self._params

    def __call__(self, raw_imgs: np.ndarray) -> np.ndarray:
        """raw_imgs: [B, H, W, 3] in [0, 1]."""
        if self.checkpoint is not None:
            import jax
            import jax.numpy as jnp

            params = self._resnet_params()
            x = (jnp.asarray(raw_imgs, jnp.float32) - IMAGENET_MEAN) \
                / IMAGENET_STD
            feats = jax.jit(resnet_trunk)(x, params)  # [B, g, g, 1024]
            b, gh, gw, c = feats.shape
            feats = np.asarray(feats.reshape(b, gh * gw, c))
            if c == self.feat_dim:
                return feats
            # match the configured feature width with a fixed projection
            rng = np.random.RandomState(self.seed)
            proj = rng.randn(c, self.feat_dim).astype(np.float32) / np.sqrt(c)
            return feats @ proj
        # hermetic stand-in: random-projected raw patches (zero-egress env)
        rng = np.random.RandomState(self.seed)
        if self._proj is None:
            c = raw_imgs.shape[-1]
            self._proj = rng.randn(c, self.feat_dim).astype(np.float32) \
                / np.sqrt(c)
        b = raw_imgs.shape[0]
        return (raw_imgs @ self._proj).reshape(b, -1, self.feat_dim)


def find_text_checkpoint(data_dir: str) -> Optional[str]:
    for sub in ("checkpoints/bert", "bert", "checkpoints/text"):
        cand = os.path.join(data_dir, sub)
        if os.path.isdir(cand) and os.path.exists(
                os.path.join(cand, "config.json")):
            return cand
    return None


class TextFeatureExtractor:
    """BERT token embeddings from any staged HuggingFace checkpoint dir,
    deterministic random vocab table otherwise. Output: [B, L, text_dim]."""

    def __init__(self, text_dim: int, vocab_size: int = 100,
                 data_dir: Optional[str] = None,
                 checkpoint: Optional[str] = None, seed: int = 0):
        self.text_dim = text_dim
        self.vocab_size = vocab_size
        self.seed = seed
        if checkpoint is None and data_dir is not None:
            checkpoint = find_text_checkpoint(data_dir)
        self.checkpoint = checkpoint
        self._table = None

    @property
    def using_real_weights(self) -> bool:
        return self.checkpoint is not None

    def _embedding_table(self) -> np.ndarray:
        if self._table is not None:
            return self._table
        if self.checkpoint is not None:
            from transformers import AutoModel

            model = AutoModel.from_pretrained(self.checkpoint,
                                              local_files_only=True)
            emb = model.get_input_embeddings().weight
            table = emb.detach().cpu().numpy().astype(np.float32)
            if table.shape[1] != self.text_dim:
                rng = np.random.RandomState(self.seed)
                proj = rng.randn(table.shape[1], self.text_dim) \
                    .astype(np.float32) / np.sqrt(table.shape[1])
                table = table @ proj
        else:
            rng = np.random.RandomState(self.seed)
            table = rng.randn(self.vocab_size, self.text_dim) \
                .astype(np.float32)
        self._table = table
        return table

    def __call__(self, token_ids: np.ndarray) -> np.ndarray:
        table = self._embedding_table()
        return table[np.clip(token_ids, 0, table.shape[0] - 1)]
