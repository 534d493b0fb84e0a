"""PAConv point-cloud classifier
(reference: paddle3d/models/classification/paconv/paconv.py:29 +
ops/assign_score_withk — the kernel-weight-assembly scatter op).

The assign_score_withk CUDA op (weight-bank gather weighted by ScoreNet
scores over knn neighborhoods) is one einsum chain in jax — autodiff
provides its backward.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...apis import manager
from ...ops.pointnet2 import knn_query
from ...sample import Sample
from ..base.base_model import Base3DModel

__all__ = ["PAConv", "assign_score_withk"]


def assign_score_withk(scores: jnp.ndarray, point_feats: jnp.ndarray,
                       center_feats: jnp.ndarray, knn_idx: jnp.ndarray,
                       weight_bank: jnp.ndarray) -> jnp.ndarray:
    """(reference: ops/assign_score_withk/assign_score_withk_cuda.cc:265).

    scores:       [N, K, M]  ScoreNet weights over M kernels.
    point_feats:  [N, Cin]   neighbor source features.
    center_feats: [N, Cin]
    knn_idx:      [N, K]
    weight_bank:  [M, Cin, Cout]
    -> [N, K, Cout] assembled features per (point, neighbor).
    """
    nbr = point_feats[knn_idx]  # [N, K, Cin]
    rel = nbr - center_feats[:, None, :]
    # per-kernel transform then score-weighted sum over kernels
    trans = jnp.einsum("nkc,mcd->nkmd", rel, weight_bank)
    return jnp.einsum("nkm,nkmd->nkd", scores, trans)


class ScoreNet(nnx.Module):
    """(reference: models/classification/paconv/score_net.py)."""

    def __init__(self, num_kernels: int, hidden: Sequence[int] = (16, 16),
                 *, rngs):
        dims = [7] + list(hidden) + [num_kernels]  # xyz_rel, xyz_c, dist
        self.layers = nnx.List([
            nnx.Linear(dims[i], dims[i + 1], rngs=rngs)
            for i in range(len(dims) - 1)
        ])

    def __call__(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = nnx.relu(x)
        return jax.nn.softmax(x, axis=-1)


@manager.MODELS.add_component
class PAConv(Base3DModel):
    def __init__(self, num_classes: int = 40, k: int = 20,
                 num_kernels: int = 8,
                 channels: Sequence[int] = (64, 64, 128, 256),
                 label_smoothing: float = 0.2,
                 pretrained: str = None, rngs: nnx.Rngs = None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.k = k
        self.num_classes = num_classes
        self.label_smoothing = label_smoothing

        cin = 3
        self.score_nets = nnx.List([])
        self.weight_banks = nnx.List([])
        self.bns = nnx.List([])
        for cout in channels:
            self.score_nets.append(ScoreNet(num_kernels, rngs=rngs))
            key = rngs.params()
            self.weight_banks.append(nnx.Param(
                jax.random.normal(key, (num_kernels, cin, cout)) *
                (1.0 / np.sqrt(cin))))
            # LayerNorm instead of BatchNorm: per-sample stats are vmap-safe
            self.bns.append(nnx.LayerNorm(cout, rngs=rngs))
            cin = cout
        self.classifier = nnx.Sequential(
            nnx.Linear(sum(channels), 256, rngs=rngs), nnx.relu,
            nnx.Linear(256, num_classes, rngs=rngs))

    def _features(self, points):
        """points [B, N, 3] -> [B, sum(C)] global features."""
        def one(pts):
            mask = jnp.ones(pts.shape[0], bool)
            idx, d2 = knn_query(self.k, pts, pts, mask)
            rel = pts[idx] - pts[:, None, :]
            score_in = jnp.concatenate([
                rel, jnp.broadcast_to(pts[:, None, :], rel.shape),
                jnp.sqrt(jnp.maximum(d2, 0.))[..., None]
            ], axis=-1)
            feats = pts
            pooled = []
            for score_net, bank, bn in zip(self.score_nets,
                                           self.weight_banks, self.bns):
                scores = score_net(score_in)  # [N, K, M]
                out = assign_score_withk(scores, feats, feats, idx,
                                         bank[...])
                out = jnp.max(out, axis=1)  # max over neighbors
                out = nnx.relu(bn(out))
                feats = out
                pooled.append(jnp.max(out, axis=0))
            return jnp.concatenate(pooled)

        return jax.vmap(one)(points)

    def train_forward(self, batch) -> dict:
        logits = self.classifier(self._features(batch["data"]))
        labels = batch["labels"]
        eps = self.label_smoothing
        onehot = jax.nn.one_hot(labels, self.num_classes)
        smooth = onehot * (1 - eps) + (1 - onehot) * eps / (
            self.num_classes - 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.sum(smooth * logp, axis=-1))
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return {"loss": loss, "acc": acc}

    def test_forward(self, batch) -> dict:
        logits = self.classifier(self._features(batch["data"]))
        return {"logits": logits, "pred": jnp.argmax(logits, axis=-1)}

    @staticmethod
    def postprocess_to_samples(outputs: dict, metas: list) -> list:
        preds = np.asarray(outputs["pred"])
        out = []
        for i, meta in enumerate(metas):
            s = Sample(path=meta.get("path"), modality="lidar")
            s.labels = preds[i]
            s.meta.update({k: v for k, v in meta.items() if k != "path"})
            out.append(s)
        return out
