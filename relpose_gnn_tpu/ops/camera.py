"""Batched camera geometry ops (JAX) + host-side image/intrinsics helpers.

TPU-native equivalents of the vendored camera operators the graph-generation
preprocessing uses (SURVEY.md §2.2 E4-E7):
  * `x_2d_coords`, `pi`, `pi_inv`, `inv_pose`, `transform_points`
    (banet_track/ba_module.py:119-125, :317-376 and
    core_3dv/camera_operator_gpu.py) — batched, jittable;
  * `camera_center_from_Tcw`, `camera_pose_inv`
    (core_3dv/camera_operator.py:48, :84);
  * `preprocess_scene` — depth back-projection to centered world points +
    RGB|XYZ concatenation (reloc_pipeline/util_func.py:136-160);
  * `preprocess_query` core — normalized query pose + scaled intrinsics
    (util_func.py:163-226);
  * `crop_by_intrinsic` — FOV-preserving crop between two intrinsic
    matrices (img_proc/img_dim.py:66-90), host-side with PIL resize;
  * depth decoding mm -> m with the 65535 invalid sentinel
    (seven_scene_manual_dataset.py:15-18);
  * `rel_rot_angle` / `rel_distance` pose metrics
    (evaluator/basic_metric.py:15-29).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops import pose as pose_ops


# ---------------------------------------------------------------------------
# Batched projective geometry (jittable; [..., ] leading batch dims)
# ---------------------------------------------------------------------------

def x_2d_coords(h: int, w: int) -> jnp.ndarray:
    """Pixel-center grid [H, W, 2] with (x, y) order
    (ba_module.py:119-125)."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([grid_x, grid_y], axis=-1)


def pi(K: jax.Array, X: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame points X [..., P, 3] through K [..., 3, 3] ->
    (x_2d [..., P, 2], depth [..., P, 1])  (batched_pi,
    ba_module.py:317-328)."""
    fx, fy = K[..., 0:1, 0], K[..., 1:2, 1]
    cx, cy = K[..., 0:1, 2], K[..., 1:2, 2]
    z = X[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx * X[..., 0] / z_safe + cx
    v = fy * X[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1), z[..., None]


def pi_inv(K: jax.Array, x_2d: jax.Array, d: jax.Array) -> jax.Array:
    """Unproject pixels x_2d [..., P, 2] with depths d [..., P, 1] ->
    camera-frame points [..., P, 3]  (batched_pi_inv,
    ba_module.py:331-344)."""
    fx, fy = K[..., 0:1, 0], K[..., 1:2, 1]
    cx, cy = K[..., 0:1, 2], K[..., 1:2, 2]
    X = (x_2d[..., 0] - cx) * d[..., 0] / fx
    Y = (x_2d[..., 1] - cy) * d[..., 0] / fy
    return jnp.stack([X, Y, d[..., 0]], axis=-1)


def inv_pose(R: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(R, t) -> (R^T, -R^T t)  (batched_inv_pose, ba_module.py:347-357)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def transform_points(R: jax.Array, t: jax.Array, X: jax.Array) -> jax.Array:
    """R X + t over point sets X [..., P, 3]  (batched_transpose,
    ba_module.py:360-376)."""
    return jnp.einsum("...ij,...pj->...pi", R, X) + t[..., None, :]


def camera_center_from_Tcw(R: jax.Array, t: jax.Array) -> jax.Array:
    """Camera center C = -R^T t (camera_operator.py:48)."""
    return -jnp.einsum("...ji,...j->...i", R, t)


def camera_pose_inv(R: jax.Array, t: jax.Array):
    """Tcw -> Twc (camera_operator.py:84)."""
    return inv_pose(R, t)


def decode_depth_mm(depth_u16: jax.Array) -> jax.Array:
    """uint16 depth in millimetres -> float metres; 65535 -> 0 (invalid)
    (seven_scene_manual_dataset.py:15-18)."""
    d = depth_u16.astype(jnp.float32)
    d = jnp.where(depth_u16 == 65535, 0.0, d)
    return d / 1000.0


# ---------------------------------------------------------------------------
# Scene / query preprocessing (util_func.py equivalents)
# ---------------------------------------------------------------------------

def preprocess_scene(rgb: jax.Array, depth: jax.Array, K: jax.Array,
                     Tcw: jax.Array):
    """Back-project scene frames to centered world points and concat RGB|XYZ.

    rgb [L, H, W, 3], depth [L, H, W], K [L, 3, 3], Tcw [L, 3, 4] ->
    dict with `scene_input` [L, H, W, 6], `X_world` [L, H, W, 3],
    `valid_mask` [L, H, W], `scene_center` [3]
    (util_func.py:136-160; the random rotation augmentation there defaults
    to identity and is omitted — callers can rotate X_world themselves).
    """
    l, h, w = depth.shape
    x2d = x_2d_coords(h, w).reshape(1, h * w, 2)
    d = depth.reshape(l, h * w, 1)
    X_cam = pi_inv(K, jnp.broadcast_to(x2d, (l, h * w, 2)), d)
    Rwc, twc = inv_pose(Tcw[:, :3, :3], Tcw[:, :3, 3])
    X_world = transform_points(Rwc, twc, X_cam)          # [L, H*W, 3]
    scene_center = jnp.mean(X_world.reshape(-1, 3), axis=0)
    X_world = X_world - scene_center
    X_world = X_world.reshape(l, h, w, 3)
    return {"scene_input": jnp.concatenate([rgb, X_world], axis=-1),
            "X_world": X_world,
            "valid_mask": depth > 1e-5,
            "scene_center": scene_center}


def preprocess_query(Tcw: jax.Array, K: jax.Array, scene_center: jax.Array,
                     out_hw: tuple[int, int], in_hw: tuple[int, int]):
    """Normalized query pose + rescaled intrinsics (util_func.py:163-226
    core: re-center the camera on the scene centroid and scale K to the
    output resolution).  Tcw [..., 3, 4], K [..., 3, 3]."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    Rwc, twc = inv_pose(R, t)
    twc = twc - scene_center
    Rcw, tcw = inv_pose(Rwc, twc)
    norm_Tcw = jnp.concatenate([Rcw, tcw[..., None]], axis=-1)
    out_h, out_w = out_hw
    in_h, in_w = in_hw
    scale = jnp.asarray([[out_w / in_w, 1.0, out_w / in_w],
                         [1.0, out_h / in_h, out_h / in_h],
                         [1.0, 1.0, 1.0]], jnp.float32)
    return {"norm_Tcw": norm_Tcw, "K_scaled": K * scale}


# ---------------------------------------------------------------------------
# Pose metrics (evaluator/basic_metric.py)
# ---------------------------------------------------------------------------

def rel_distance(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """Distance between the camera centers of two [..., 3, 4] poses
    (basic_metric.py:24-29)."""
    c1 = camera_center_from_Tcw(T1[..., :3, :3], T1[..., :3, 3])
    c2 = camera_center_from_Tcw(T2[..., :3, :3], T2[..., :3, 3])
    return jnp.linalg.norm(c1 - c2, axis=-1)


def rel_rot_angle(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """Relative rotation angle in degrees between two [..., 3, 4] poses
    (basic_metric.py:15-21)."""
    R = jnp.einsum("...ij,...kj->...ik", T1[..., :3, :3], T2[..., :3, :3])
    q = pose_ops.mat2quat(R)
    return 2.0 * jnp.arccos(jnp.clip(jnp.abs(q[..., 0]), 0.0, 1.0)) \
        * (180.0 / jnp.pi)


# ---------------------------------------------------------------------------
# Host-side PnP pose solving (reloc_pipeline/util_func.py:255-296)
# ---------------------------------------------------------------------------

def solve_pnp_ransac(x_2d: np.ndarray, X_3d: np.ndarray, K: np.ndarray,
                     reproj_threshold: float = 1.0,
                     iterations: int = 100):
    """RANSAC PnP camera pose from 2D-3D correspondences.

    Host-side wrapper around cv2.solvePnPRansac, the used half of
    `compute_pose_pnp_from_valid_pixels` (util_func.py:255-296; the LM-PnP
    C++ variant there is dead code — its import is commented out,
    util_func.py:29-31).  Returns (R [3,3], t [3], inlier_mask [P]) of the
    world->camera pose, or None on failure.
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("OpenCV required for PnP") from e

    x_2d = np.ascontiguousarray(x_2d, np.float64).reshape(-1, 1, 2)
    X_3d = np.ascontiguousarray(X_3d, np.float64).reshape(-1, 1, 3)
    ok, rvec, tvec, inliers = cv2.solvePnPRansac(
        X_3d, x_2d, np.asarray(K, np.float64), None,
        reprojectionError=reproj_threshold, iterationsCount=iterations,
        flags=cv2.SOLVEPNP_EPNP)
    if not ok:
        return None
    R, _ = cv2.Rodrigues(rvec)
    mask = np.zeros(len(x_2d), bool)
    if inliers is not None:
        mask[inliers.ravel()] = True
    return R, tvec.ravel(), mask


# ---------------------------------------------------------------------------
# Host-side intrinsics-aware cropping (img_proc/img_dim.py:66-90)
# ---------------------------------------------------------------------------

def crop_by_intrinsic(img: np.ndarray, cur_k: np.ndarray,
                      new_k: np.ndarray) -> np.ndarray:
    """FOV-preserving crop: rescale by the focal ratio, then center-crop to
    the new principal-point extent.  Only crops to a smaller FOV."""
    from PIL import Image

    cur_fov_x = 2 * np.arctan(cur_k[0, 2] / cur_k[0, 0])
    new_fov_x = 2 * np.arctan(new_k[0, 2] / new_k[0, 0])
    cur_fov_y = 2 * np.arctan(cur_k[1, 2] / cur_k[1, 1])
    new_fov_y = 2 * np.arctan(new_k[1, 2] / new_k[1, 1])
    if cur_fov_x < new_fov_x or cur_fov_y < new_fov_y:
        raise ValueError("new camera FOV larger than current")

    ratio = new_k[0, 0] / cur_k[0, 0]
    h, w = img.shape[:2]
    nw, nh = int(ratio * w), int(ratio * h)
    if img.dtype != np.uint8:
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    else:
        pil = Image.fromarray(img)
    resized = np.asarray(pil.resize((nw, nh), Image.BILINEAR))
    if img.dtype != np.uint8:
        resized = resized.astype(np.float32) / 255.0

    out_h, out_w = int(2 * new_k[1, 2]), int(2 * new_k[0, 2])
    y0 = (nh - out_h) // 2
    x0 = (nw - out_w) // 2
    return resized[y0:y0 + out_h, x0:x0 + out_w]
