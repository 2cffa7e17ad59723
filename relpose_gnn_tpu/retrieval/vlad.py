"""Classical VLAD retrieval (Cambridge path).

Re-design of the vendored offline pipeline `external/VLAD/VLADlib`
(SURVEY.md §2.2 E8): ORB local descriptors -> KMeans visual dictionary ->
VLAD aggregation with power + L2 normalization -> top-k retrieval.

TPU-first changes:
  * the per-cluster Python loop in VLAD aggregation (VLAD.py:177-203)
    becomes a one-hot assignment matmul, jittable and batched;
  * the sklearn BallTree index (VLAD.py:237-257) is replaced by an exact
    batched cosine/L2 top-k over a dense descriptor matrix on device;
  * ORB extraction and KMeans fitting stay on the host (offline CPU preproc,
    gated on cv2 availability), matching SURVEY.md §2.3's guidance.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

try:
    import cv2  # OpenCV is an optional host-side dependency

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def orb_descriptors(image_u8: np.ndarray, n_features: int = 500
                    ) -> np.ndarray | None:
    """ORB descriptors of one grayscale/RGB uint8 image
    (Descriptors.py:27-33 equivalent).  Returns [n, 32] uint8 or None."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV not available for ORB extraction")
    if image_u8.ndim == 3:
        image_u8 = cv2.cvtColor(image_u8, cv2.COLOR_RGB2GRAY)
    orb = cv2.ORB_create(nfeatures=n_features)
    _, desc = orb.detectAndCompute(image_u8, None)
    return desc


def fit_visual_dictionary(descriptors: np.ndarray, k: int, seed: int = 0):
    """KMeans visual dictionary (VLAD.py:41-48). Host-side, offline."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=k, n_init=10, random_state=seed)
    km.fit(np.asarray(descriptors, np.float32))
    return km.cluster_centers_.astype(np.float32)


def vlad_aggregate(descriptors: jax.Array, centers: jax.Array) -> jax.Array:
    """VLAD vector of one image's local descriptors.

    descriptors: [P, D] float; centers: [K, D].
    Hard-assigns each descriptor to its nearest center, sums residuals per
    center, then power-normalizes (signed sqrt) and L2-normalizes — the
    `improvedVLAD` recipe (VLAD.py:177-203) as one one-hot matmul.
    """
    # HIGHEST precision: these distances feed argmin (CLAUDE.md numerics
    # rule — the default bf16-class fast path can flip near-tie
    # assignments and change descriptors vs the numpy oracle)
    d2 = (jnp.sum(descriptors ** 2, axis=1)[:, None]
          - 2.0 * jnp.matmul(descriptors, centers.T,
                             precision=jax.lax.Precision.HIGHEST)
          + jnp.sum(centers ** 2, axis=1)[None])
    assign = jax.nn.one_hot(jnp.argmin(d2, axis=1), centers.shape[0],
                            dtype=descriptors.dtype)          # [P, K]
    agg = jnp.matmul(assign.T, descriptors,
                     precision=jax.lax.Precision.HIGHEST)        # [K, D]
    mass = jnp.sum(assign, axis=0)[:, None]                    # [K, 1]
    v = agg - mass * centers
    v = v.reshape(-1)
    v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))                     # power norm
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


@dataclass
class VLADIndex:
    """Dense VLAD descriptor index with on-device exact top-k
    (BallTree replacement)."""

    centers: np.ndarray                 # [K, D] visual dictionary
    descriptors: np.ndarray | None = None  # [M, K*D]

    def describe(self, local_descs: np.ndarray) -> np.ndarray:
        return np.asarray(vlad_aggregate(
            jnp.asarray(local_descs, jnp.float32),
            jnp.asarray(self.centers)))

    def build(self, per_image_descs: list[np.ndarray]) -> None:
        self.descriptors = np.stack([self.describe(d)
                                     for d in per_image_descs])
        self._db_device = None  # invalidate the device-resident copy

    def query(self, local_descs: np.ndarray, k: int):
        """Top-k most similar database images for one query image
        (VLAD.py:243-257 equivalent)."""
        assert self.descriptors is not None
        q = self.describe(local_descs)
        # device-resident DB, uploaded once per build (re-uploading the
        # [M, K*D] matrix per query would dominate latency on a slow link)
        if getattr(self, "_db_device", None) is None:
            self._db_device = jnp.asarray(self.descriptors)
        sim = jnp.matmul(self._db_device, jnp.asarray(q),
                        precision=jax.lax.Precision.HIGHEST)
        scores, idx = jax.lax.top_k(sim, k)
        return np.asarray(scores), np.asarray(idx)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump({"centers": self.centers,
                         "descriptors": self.descriptors}, f)

    @classmethod
    def load(cls, path: str) -> "VLADIndex":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return cls(centers=d["centers"], descriptors=d["descriptors"])
