"""Real-weights feature-extractor paths, validated WITHOUT egress.

VERDICT r2 item 9: the CLEVR extractors' real-checkpoint code paths
(ResNet-101 patch features, BERT token embeddings —
`/root/reference/src/data_multi.py:201-285`) had never run because no
weights exist in the zero-egress env. These tests close that by
generating random weights in the EXACT on-disk formats the real paths
consume — a torchvision-schema `resnet101*.pth` state dict and a
HuggingFace BERT checkpoint directory — so the only difference from a
production run is the weight values. A final skipif-gated test runs
against genuinely staged checkpoints when present (staging filenames:
scripts/fetch_data.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from graphax.data.extractors import (
    ImageFeatureExtractor, TextFeatureExtractor, find_resnet_checkpoint,
    find_text_checkpoint, resnet_trunk,
)


def _rand_resnet_state_dict(stages, widths, rng, in_ch=3, stem=8):
    """Random torchvision-resnet-schema state dict (bottleneck blocks)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.tensor(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(
            1.0 + 0.1 * rng.randn(c).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(
            0.1 * rng.randn(c).astype(np.float32))
        sd[name + ".running_mean"] = torch.tensor(
            0.1 * rng.randn(c).astype(np.float32))
        sd[name + ".running_var"] = torch.tensor(
            np.abs(1.0 + 0.1 * rng.randn(c)).astype(np.float32))

    conv("conv1", stem, in_ch, 7)
    bn("bn1", stem)
    cin = stem
    for s, blocks in enumerate(stages):
        mid = widths[s]
        cout = 4 * mid
        for i in range(blocks):
            p = f"layer{s + 1}.{i}"
            conv(p + ".conv1", mid, cin, 1)
            bn(p + ".bn1", mid)
            conv(p + ".conv2", mid, mid, 3)
            bn(p + ".bn2", mid)
            conv(p + ".conv3", cout, mid, 1)
            bn(p + ".bn3", cout)
            if i == 0:
                conv(p + ".downsample.0", cout, cin, 1)
                bn(p + ".downsample.1", cout)
            cin = cout
    return sd


def _torch_resnet_forward(x_nhwc, sd, stages, out_stage):
    """Independent torch forward of the same trunk (NCHW, eval-mode BN)."""
    import torch.nn.functional as F

    def conv(x, name, stride=1):
        w = sd[name + ".weight"]
        return F.conv2d(x, w, stride=stride, padding=w.shape[2] // 2)

    def bn(x, name):
        return F.batch_norm(x, sd[name + ".running_mean"],
                            sd[name + ".running_var"],
                            sd[name + ".weight"], sd[name + ".bias"],
                            training=False, eps=1e-5)

    x = torch.tensor(np.moveaxis(x_nhwc, -1, 1))
    x = F.relu(bn(conv(x, "conv1", 2), "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for s in range(out_stage):
        for i in range(stages[s]):
            stride = 2 if (s > 0 and i == 0) else 1
            p = f"layer{s + 1}.{i}"
            out = F.relu(bn(conv(x, p + ".conv1"), p + ".bn1"))
            out = F.relu(bn(conv(out, p + ".conv2", stride), p + ".bn2"))
            out = bn(conv(out, p + ".conv3"), p + ".bn3")
            if (p + ".downsample.0.weight") in sd:
                sc = bn(conv(x, p + ".downsample.0", stride),
                        p + ".downsample.1")
            else:
                sc = x
            x = F.relu(out + sc)
    return np.moveaxis(x.numpy(), 1, -1)


def test_resnet_trunk_matches_torch_oracle():
    """The JAX trunk (NHWC, torch OIHW weights, torch padding/pooling
    conventions) reproduces an independent torch forward of the same
    random weights — pins conv padding, BN eval math, downsample wiring."""
    rng = np.random.RandomState(0)
    stages, widths = (2, 2, 2), (4, 8, 8)
    sd = _rand_resnet_state_dict(stages, widths, rng)
    params = {k: v.numpy() for k, v in sd.items()}
    x = rng.rand(2, 32, 32, 3).astype(np.float32)

    got = np.asarray(resnet_trunk(x, params, stages=stages, out_stage=3))
    want = _torch_resnet_forward(x, sd, stages, out_stage=3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_image_extractor_real_checkpoint_path(tmp_path):
    """ImageFeatureExtractor end-to-end through a resnet101-schema .pth:
    discovery (find_resnet_checkpoint), torch state-dict load, the full
    23-block layer3 trunk, and the width projection."""
    rng = np.random.RandomState(1)
    grid = 2
    # full resnet101 key schema through layer3 (what out_stage=3 consumes),
    # at reduced widths so the test stays fast; layer4 is unused
    sd = _rand_resnet_state_dict((3, 4, 23), (4, 8, 16), rng)
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    torch.save(sd, ckpt_dir / "resnet101-random.pth")

    ex = ImageFeatureExtractor(feat_dim=12, grid=grid,
                               data_dir=str(tmp_path), seed=0)
    assert ex.using_real_weights
    assert find_resnet_checkpoint(str(tmp_path)).endswith(
        "resnet101-random.pth")
    raw = rng.rand(2, grid * 16, grid * 16, 3).astype(np.float32)
    feats = ex(raw)
    assert feats.shape == (2, grid * grid, 12)
    assert np.isfinite(feats).all()
    # deterministic given the checkpoint
    feats2 = ImageFeatureExtractor(feat_dim=12, grid=grid,
                                   data_dir=str(tmp_path), seed=0)(raw)
    np.testing.assert_allclose(feats, feats2, rtol=1e-6)


def test_text_extractor_real_checkpoint_path(tmp_path):
    """TextFeatureExtractor end-to-end through a genuine HuggingFace BERT
    checkpoint directory (tiny config, random weights — transformers
    save/load round trip, embedding-table extraction, width projection)."""
    transformers = pytest.importorskip("transformers")

    cfg = transformers.BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32)
    model = transformers.BertModel(cfg)
    bert_dir = tmp_path / "checkpoints" / "bert"
    model.save_pretrained(bert_dir)

    ex = TextFeatureExtractor(text_dim=16, data_dir=str(tmp_path), seed=0)
    assert ex.using_real_weights
    assert find_text_checkpoint(str(tmp_path)) is not None
    ids = np.array([[1, 4, 9], [0, 2, 49]])
    out = ex(ids)
    table = model.get_input_embeddings().weight.detach().numpy()
    np.testing.assert_allclose(out, table[ids], rtol=1e-6)
    # width-projection branch
    ex8 = TextFeatureExtractor(text_dim=8, data_dir=str(tmp_path), seed=0)
    out8 = ex8(ids)
    assert out8.shape == (2, 3, 8) and np.isfinite(out8).all()


STAGED = os.environ.get("GRAPHAX_DATA_DIR", "./data")


@pytest.mark.skipif(
    find_resnet_checkpoint(STAGED) is None
    and find_text_checkpoint(STAGED) is None,
    reason="no real extractor checkpoints staged (see scripts/fetch_data.py"
           " --help for the exact filenames)")
def test_staged_real_checkpoints_produce_features():
    """Runs only when genuine pretrained checkpoints are staged under
    ./data (or GRAPHAX_DATA_DIR): the production CLEVR feature path."""
    if find_resnet_checkpoint(STAGED) is not None:
        ex = ImageFeatureExtractor(feat_dim=64, grid=2, data_dir=STAGED)
        feats = ex(np.random.RandomState(0)
                   .rand(1, 32, 32, 3).astype(np.float32))
        assert feats.shape == (1, 4, 64) and np.isfinite(feats).all()
    if find_text_checkpoint(STAGED) is not None:
        ex = TextFeatureExtractor(text_dim=32, data_dir=STAGED)
        out = ex(np.arange(6).reshape(2, 3))
        assert out.shape == (2, 3, 32) and np.isfinite(out).all()
