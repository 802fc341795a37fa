"""DETR object detection (reference pytorch_models/image/detr.py).

From-scratch ResNet-50/101 backbone (ref detr.py:11-61) → 1×1 input proj →
fixed 2D sinusoidal PE normalized to 2π with interleaved sin/cos (ref
87-102) → 6 post-norm encoder layers with PE added to q,k only (ref 76-84)
→ 6 decoder layers with learned query embeddings added to q,k and PE-added
memory keys — all 100 queries decoded in parallel, no causal masking (ref
64-73) → class head + 3-layer box MLP → sigmoid cxcywh. NHWC backbone;
encoder/decoder stacks are ``lax.scan`` over stacked layer params.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ... import transformer as tfm
from ...ops import layer_norm
from ...ops.layers import batch_norm, bn_init, conv2d, conv2d_init, max_pool2d
from ...utils import StateDict, hub_download, stack_layers
from pytorch_models_tpu.utils.module import InferenceModel

RELU = jax.nn.relu


@dataclass(frozen=True)
class DETRConfig:
    backbone_layers: tuple[int, ...]
    d_model: int = 256
    n_classes: int = 91
    n_queries: int = 100
    n_enc_layers: int = 6
    n_dec_layers: int = 6

    @property
    def layer(self) -> tfm.LayerConfig:
        return tfm.LayerConfig.make(self.d_model, n_heads=8, act="relu", mlp_ratio=8, pre_norm=False)


# ---------------------------------------------------------------------------
# ResNet backbone (ref detr.py:11-61)
# ---------------------------------------------------------------------------


def _bottleneck_init(key, in_dim, out_dim, stride):
    mid = out_dim // 4
    ks = jax.random.split(key, 4)
    p = {
        "conv1": conv2d_init(ks[0], 1, 1, in_dim, mid, bias=False), "bn1": bn_init(mid),
        "conv2": conv2d_init(ks[1], 3, 3, mid, mid, bias=False), "bn2": bn_init(mid),
        "conv3": conv2d_init(ks[2], 1, 1, mid, out_dim, bias=False), "bn3": bn_init(out_dim),
    }
    if stride > 1 or in_dim != out_dim:
        p["down_conv"] = conv2d_init(ks[3], 1, 1, in_dim, out_dim, bias=False)
        p["down_bn"] = bn_init(out_dim)
    return p


def _bottleneck(p, x, stride):
    h = RELU(batch_norm(p["bn1"], conv2d(p["conv1"], x)))
    h = RELU(batch_norm(p["bn2"], conv2d(p["conv2"], h, stride=stride, padding=1)))
    h = batch_norm(p["bn3"], conv2d(p["conv3"], h))
    short = batch_norm(p["down_bn"], conv2d(p["down_conv"], x, stride=stride)) if "down_conv" in p else x
    return RELU(short + h)


def resnet_apply(p, cfg: DETRConfig, x):
    x = conv2d(p["stem_conv"], x, stride=2, padding=3)
    x = RELU(batch_norm(p["stem_bn"], x))
    x = max_pool2d(x, 3, 2, padding=1)
    for stage_idx, stage in enumerate(p["stages"]):
        for block_idx, bp in enumerate(stage):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = _bottleneck(bp, x, stride)
    return x


# ---------------------------------------------------------------------------
# 2D sinusoidal position embedding (ref detr.py:87-102)
# ---------------------------------------------------------------------------


def sinusoidal_pe_2d(h: int, w: int, d_model: int) -> jnp.ndarray:
    d = d_model // 2
    freqs = 10_000.0 ** (-2 * np.arange(d // 2) / d)

    def make(x):
        ts = np.arange(1, x + 1, dtype=np.float64) / (x + 1e-6) * 2 * math.pi
        out = ts[:, None] * freqs
        return np.stack([np.sin(out), np.cos(out)], axis=2).reshape(x, -1)

    y_emb = np.broadcast_to(make(h)[:, None, :], (h, w, d))
    x_emb = np.broadcast_to(make(w)[None, :, :], (h, w, d))
    return jnp.asarray(np.concatenate([y_emb, x_emb], axis=2), jnp.float32)


# ---------------------------------------------------------------------------
# Transformer layers (ref detr.py:64-84)
# ---------------------------------------------------------------------------


def _enc_layer(p, cfg: DETRConfig, x, pos):
    lc = cfg.layer
    qk = x + pos
    x = layer_norm(p["sa_norm"], x + tfm.mha_apply(p["sa"], lc, qk, qk, x))
    x = layer_norm(p["mlp_norm"], x + tfm.mlp_apply(p["mlp"], x, "relu"))
    return x


def _dec_layer(p, cfg: DETRConfig, x, memory, query_embed, pos):
    lc = cfg.layer
    qk = x + query_embed
    x = layer_norm(p["sa_norm"], x + tfm.mha_apply(p["sa"], lc, qk, qk, x))
    x = layer_norm(p["ca_norm"], x + tfm.mha_apply(p["ca"], lc, x + query_embed, memory + pos, memory))
    x = layer_norm(p["mlp_norm"], x + tfm.mlp_apply(p["mlp"], x, "relu"))
    return x


def detr_init(key, cfg: DETRConfig) -> dict:
    ks = iter(jax.random.split(key, 64))
    in_dim = 64
    stages = []
    for i, n_layer in enumerate(cfg.backbone_layers):
        out_dim = 256 * 2**i
        stage = [_bottleneck_init(next(ks), in_dim, out_dim, 1 if i == 0 else 2)]
        stage += [_bottleneck_init(next(ks), out_dim, out_dim, 1) for _ in range(n_layer - 1)]
        stages.append(stage)
        in_dim = out_dim
    lc = cfg.layer
    p = {
        "stem_conv": conv2d_init(next(ks), 7, 7, 3, 64, bias=False),
        "stem_bn": bn_init(64),
        "stages": stages,
        "input_proj": conv2d_init(next(ks), 1, 1, in_dim, cfg.d_model),
        "query_embed": jnp.zeros((cfg.n_queries, cfg.d_model), jnp.float32),
        "encoder": {"layers": stack_layers([tfm.layer_init(next(ks), lc) for _ in range(cfg.n_enc_layers)])},
        "decoder": {"layers": stack_layers(
            [tfm.layer_init(next(ks), lc.with_(cross_attn=True)) for _ in range(cfg.n_dec_layers)])},
        "norm": tfm.ln_init(cfg.d_model),
        "classifier": tfm.linear_init(next(ks), cfg.d_model, cfg.n_classes + 1),
        "box_head": [tfm.linear_init(next(ks), cfg.d_model, cfg.d_model),
                     tfm.linear_init(next(ks), cfg.d_model, cfg.d_model),
                     tfm.linear_init(next(ks), cfg.d_model, 4)],
    }
    return p


@partial(jax.jit, static_argnums=1)
def detr_apply(params, cfg: DETRConfig, imgs: jnp.ndarray):
    """Forward (ref detr.py:128-146): (N,3,H,W) -> (logits, boxes)."""
    x = jnp.transpose(imgs, (0, 2, 3, 1))
    x = resnet_apply(params, cfg, x)
    x = conv2d(params["input_proj"], x)
    h, w = x.shape[1], x.shape[2]
    pos = sinusoidal_pe_2d(h, w, cfg.d_model).reshape(h * w, cfg.d_model)
    x = x.reshape(x.shape[0], h * w, cfg.d_model)

    def enc_body(hh, lp):
        return _enc_layer(lp, cfg, hh, pos), None

    x, _ = jax.lax.scan(enc_body, x, params["encoder"]["layers"])

    query = jnp.zeros((x.shape[0], cfg.n_queries, cfg.d_model), x.dtype)
    qe = params["query_embed"].astype(x.dtype)

    def dec_body(qq, lp):
        return _dec_layer(lp, cfg, qq, x, qe, pos), None

    query, _ = jax.lax.scan(dec_body, query, params["decoder"]["layers"])
    query = layer_norm(params["norm"], query)
    logits = tfm.linear(params["classifier"], query)
    bh = params["box_head"]
    boxes = tfm.linear(bh[2], RELU(tfm.linear(bh[1], RELU(tfm.linear(bh[0], query)))))
    return logits, jax.nn.sigmoid(boxes)


class DETR(InferenceModel):
    def __init__(self, backbone_layers, d_model: int = 256, n_classes: int = 91, n_queries: int = 100,
                 rng: int = 0) -> None:
        self.cfg = DETRConfig(tuple(backbone_layers), d_model, n_classes, n_queries)
        self.params = detr_init(jax.random.PRNGKey(rng), self.cfg)

    def __call__(self, imgs):
        return detr_apply(self.params, self.cfg, jnp.asarray(imgs))

    @staticmethod
    def from_facebook(model_tag: str, *, pretrained: bool = False) -> "DETR":
        backbone_layers, ckpt = dict(
            resnet50=([3, 4, 6, 3], "detr-r50-e632da11.pth"),
            resnet101=([3, 4, 23, 3], "detr-r101-2c7b67e5.pth"),
        )[model_tag]
        m = DETR(backbone_layers)
        if pretrained:
            from ...utils.torch_ckpt import load_torch_checkpoint

            sd = load_torch_checkpoint(hub_download(f"https://dl.fbaipublicfiles.com/detr/{ckpt}"))["model"]
            m.load_facebook_state_dict(sd)
        return m

    def load_facebook_state_dict(self, state_dict: dict) -> None:
        """facebookresearch/detr checkpoint (key map per ref detr.py:164-229)."""
        sd = StateDict(state_dict)
        cfg = self.cfg

        def bn(pfx):
            p = {"scale": sd.pop(f"{pfx}.weight"), "bias": sd.pop(f"{pfx}.bias"),
                 "mean": sd.pop(f"{pfx}.running_mean"), "var": sd.pop(f"{pfx}.running_var")}
            sd.pop(f"{pfx}.num_batches_tracked", None)
            return p

        def mha(pfx):
            qw, kw, vw = np.split(sd.pop(f"{pfx}.in_proj_weight"), 3, axis=0)
            qb, kb, vb = np.split(sd.pop(f"{pfx}.in_proj_bias"), 3, axis=0)
            return {
                "q": {"w": qw.T, "b": qb}, "k": {"w": kw.T, "b": kb}, "v": {"w": vw.T, "b": vb},
                "o": sd.pop_linear(f"{pfx}.out_proj"),
            }

        stages = []
        in_dim = 64
        for stage_idx, n_layer in enumerate(cfg.backbone_layers):
            out_dim = 256 * 2**stage_idx
            stage = []
            for block_idx in range(n_layer):
                pfx = f"backbone.0.body.layer{stage_idx + 1}.{block_idx}"
                bp = {
                    "conv1": sd.pop_conv2d(f"{pfx}.conv1", bias=False), "bn1": bn(f"{pfx}.bn1"),
                    "conv2": sd.pop_conv2d(f"{pfx}.conv2", bias=False), "bn2": bn(f"{pfx}.bn2"),
                    "conv3": sd.pop_conv2d(f"{pfx}.conv3", bias=False), "bn3": bn(f"{pfx}.bn3"),
                }
                if block_idx == 0:
                    bp["down_conv"] = sd.pop_conv2d(f"{pfx}.downsample.0", bias=False)
                    bp["down_bn"] = bn(f"{pfx}.downsample.1")
                stage.append(bp)
            stages.append(stage)
            in_dim = out_dim

        def tf_layer(pfx, cross):
            lp = {
                "sa": mha(f"{pfx}.self_attn"),
                "sa_norm": sd.pop_ln(f"{pfx}.norm1"),
                "mlp": {"fc1": sd.pop_linear(f"{pfx}.linear1"), "fc2": sd.pop_linear(f"{pfx}.linear2")},
            }
            if cross:
                lp["ca"] = mha(f"{pfx}.multihead_attn")
                lp["ca_norm"] = sd.pop_ln(f"{pfx}.norm2")
                lp["mlp_norm"] = sd.pop_ln(f"{pfx}.norm3")
            else:
                lp["mlp_norm"] = sd.pop_ln(f"{pfx}.norm2")
            return jax.tree.map(jnp.asarray, lp)

        p = {
            "stem_conv": sd.pop_conv2d("backbone.0.body.conv1", bias=False),
            "stem_bn": bn("backbone.0.body.bn1"),
            "stages": stages,
            "input_proj": sd.pop_conv2d("input_proj"),
            "query_embed": sd.pop("query_embed.weight"),
            "encoder": {"layers": stack_layers(
                [tf_layer(f"transformer.encoder.layers.{i}", False) for i in range(cfg.n_enc_layers)])},
            "decoder": {"layers": stack_layers(
                [tf_layer(f"transformer.decoder.layers.{i}", True) for i in range(cfg.n_dec_layers)])},
            "norm": sd.pop_ln("transformer.decoder.norm"),
            "classifier": sd.pop_linear("class_embed"),
            "box_head": [sd.pop_linear("bbox_embed.layers.0"), sd.pop_linear("bbox_embed.layers.1"),
                         sd.pop_linear("bbox_embed.layers.2")],
        }
        sd.finalize()
        self.params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)


class DETRPipeline:
    """Batched detection over variable-size images (ref detr.py:232-286)."""

    # fmt: off
    COCO_CLASSES = [
        "N/A", "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck", "boat", "traffic light",
        "fire hydrant", "N/A", "stop sign", "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
        "elephant", "bear", "zebra", "giraffe", "N/A", "backpack", "umbrella", "N/A", "N/A", "handbag", "tie",
        "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
        "skateboard", "surfboard", "tennis racket", "bottle", "N/A", "wine glass", "cup", "fork", "knife", "spoon",
        "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza", "donut", "cake",
        "chair", "couch", "potted plant", "bed", "N/A", "dining table", "N/A", "N/A", "toilet", "N/A", "tv", "laptop",
        "mouse", "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink", "refrigerator", "N/A",
        "book", "clock", "vase", "scissors", "teddy bear", "hair drier", "toothbrush",
    ]
    # fmt: on

    MEAN = np.array([0.485, 0.456, 0.406], np.float32).reshape(3, 1, 1)
    STD = np.array([0.229, 0.224, 0.225], np.float32).reshape(3, 1, 1)

    def __init__(self, model: DETR, threshold: float = 0.7) -> None:
        self.model = model
        self.th = threshold

    @staticmethod
    def cxcywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
        x1 = boxes[..., 0] - boxes[..., 2] * 0.5
        y1 = boxes[..., 1] - boxes[..., 3] * 0.5
        x2 = boxes[..., 0] + boxes[..., 2] * 0.5
        y2 = boxes[..., 1] + boxes[..., 3] * 0.5
        return np.stack([x1, y1, x2, y2], axis=-1)

    def __call__(self, images: list, th: float | None = None):
        """images: list of (3, H, W) float arrays in [0,1]; returns per-image
        [class names, xyxy pixel boxes, probabilities] (ref detr.py:262-286)."""
        images = [np.asarray(img, np.float32) for img in images]
        height = max(img.shape[-2] for img in images)
        width = max(img.shape[-1] for img in images)
        padded = np.stack(
            [np.pad(img, ((0, 0), (0, height - img.shape[-2]), (0, width - img.shape[-1]))) for img in images]
        )
        padded = (padded - self.MEAN) / self.STD

        logits, boxes = self.model(padded)
        logits, boxes = np.asarray(logits), np.asarray(boxes)

        probs = _softmax_np(logits)[..., :-1]
        keep = probs.max(-1) >= (th or self.th)
        boxes = boxes * np.array([width, height, width, height], np.float32)
        boxes = self.cxcywh_to_xyxy(boxes)

        outputs = []
        for i in range(padded.shape[0]):
            img_probs = probs[i, keep[i]].max(-1)
            img_class_ids = probs[i, keep[i]].argmax(-1)
            img_classes = [self.COCO_CLASSES[c] for c in img_class_ids]
            outputs.append([img_classes, boxes[i, keep[i]], img_probs])
        return outputs

    forward = __call__


def _softmax_np(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)
