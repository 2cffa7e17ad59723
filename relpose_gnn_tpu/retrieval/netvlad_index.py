"""NetVLAD descriptor index: batched embedding + on-device retrieval.

Replaces the reference's in-memory list of per-frame descriptors + sklearn
cosine_similarity loop (dataset_7Scenes_multi.py:239-243,
vlad_encoder.py:53-78) with a single [M, 32768] device array; query ranking
is one matmul.  Descriptor embedding batches frames through the jitted
encoder instead of batch_size=1.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
from relpose_gnn_tpu.retrieval import subsample

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# 7-Scenes Kinect intrinsics: RGB camera vs depth camera
# (seven_scene_manual_dataset.py:34-35: K_img fx=525, K_depth fx=585)
K_7SCENES_RGB = np.array([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]])
K_7SCENES_DEPTH = np.array([[585.0, 0, 320], [0, 585.0, 240], [0, 0, 1]])


def imagenet_normalize(images: np.ndarray) -> np.ndarray:
    """[..., H, W, 3] float RGB in [0,1] -> ImageNet-normalized (the
    transform at dataset_7Scenes_multi.py:162-163)."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD


def netvlad_preprocess_7scenes(img_01: np.ndarray,
                               out_hw: tuple[int, int] = (192, 256)
                               ) -> np.ndarray:
    """Reference NetVLAD input geometry for a raw 640x480 7-Scenes frame:
    FOV crop from the RGB to the depth intrinsics, then resize to 192x256
    (seven_scene_manual_dataset.py:34-61) and ImageNet-normalize.

    For non-640x480 inputs (already-resized frames), skips the intrinsics
    crop and just resizes.
    """
    from PIL import Image

    from relpose_gnn_tpu.ops.camera import crop_by_intrinsic

    if img_01.shape[:2] == (480, 640):
        img_01 = crop_by_intrinsic(img_01, K_7SCENES_RGB, K_7SCENES_DEPTH)
    pil = Image.fromarray((np.clip(img_01, 0, 1) * 255).astype(np.uint8))
    out = np.asarray(pil.resize((out_hw[1], out_hw[0]), Image.BILINEAR),
                     np.float32) / 255.0
    return imagenet_normalize(out)


class NetVLADIndex:
    """Builds and queries a descriptor database on device."""

    def __init__(self, variables=None, batch_size: int = 16,
                 dtype=jnp.bfloat16, rng: jax.Array | None = None,
                 image_hw: tuple[int, int] = (192, 256),
                 num_clusters: int = 64, encoder_dim: int = 512):
        self.encoder = NetVLADEncoder(num_clusters=num_clusters,
                                      encoder_dim=encoder_dim, dtype=dtype)
        self.batch_size = batch_size
        self.image_hw = image_hw
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, *image_hw, 3), jnp.float32)
            variables = self.encoder.init(rng, dummy)
        self.variables = variables
        self._embed = jax.jit(self.encoder.apply)
        self.descriptors: jnp.ndarray | None = None  # [M, 32768]

    def embed(self, images: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] ImageNet-normalized -> [B, K*encoder_dim] float32."""
        out = []
        for i in range(0, len(images), self.batch_size):
            chunk = jnp.asarray(images[i:i + self.batch_size])
            out.append(np.asarray(self._embed(self.variables, chunk),
                                  np.float32))
        if out:
            return np.concatenate(out)
        return np.zeros(
            (0, self.encoder.num_clusters * self.encoder.encoder_dim),
            np.float32)

    def build(self, images: Iterable[np.ndarray] | np.ndarray) -> None:
        images = np.asarray(images)
        self.descriptors = jnp.asarray(self.embed(images))

    def add(self, images: np.ndarray) -> None:
        d = jnp.asarray(self.embed(np.asarray(images)))
        self.descriptors = (d if self.descriptors is None
                            else jnp.concatenate([self.descriptors, d]))

    def similarities(self, query_desc: np.ndarray) -> np.ndarray:
        """Cosine similarity of queries vs the whole DB: [Q, M]."""
        assert self.descriptors is not None, "call build() first"
        q = jnp.asarray(query_desc)
        # HIGHEST: similarity ranking is numerically sensitive on
        # near-duplicate frames (CLAUDE.md numerics rule)
        return np.asarray(jnp.matmul(q, self.descriptors.T,
                                     precision=jax.lax.Precision.HIGHEST))

    def topk(self, query_desc: np.ndarray, k: int):
        scores, idx = subsample.cosine_topk(self.descriptors,
                                            jnp.asarray(query_desc), k)
        return np.asarray(scores), np.asarray(idx)

    def graph_neighbors(self, query_desc: np.ndarray, k: int,
                        sampling_period: int, rng: np.random.Generator,
                        invalid: np.ndarray | None = None) -> np.ndarray:
        """Full reference neighbor-selection pipeline for one query
        (rank -> filter -> random drop -> stride -> top-k)."""
        sim = self.similarities(query_desc[None])[0]
        order = subsample.rank_and_filter_numpy(sim, invalid)
        return subsample.subsample_ranked_numpy(order, k, sampling_period,
                                                rng)
