"""Orbax checkpointing: params + optimizer state + step (true resume).

The reference saves `{epoch, model/optim/criterion state_dicts}` at epochs
149/199 only and restores *weights only* — no true resume
(utils/utils.py:22-31, train.py:214-219; SURVEY.md §5).  Here:
  * `save_checkpoint` persists the full TrainState (params incl. criterion
    scalars, BN stats, optimizer moments, step) via Orbax;
  * `restore_checkpoint` resumes exactly;
  * `load_torch_weights` warm-starts model weights from a converted
    reference `.pth.tar` (the parity path for released checkpoints).
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np
import orbax.checkpoint as ocp

from relpose_gnn_tpu.models import convert as tconvert


def _manager(logdir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        osp.abspath(logdir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(logdir: str, state, epoch: int,
                    max_to_keep: int = 5) -> None:
    """Persist the full train state under `logdir/<epoch>/`.

    On single-process accelerator backends the state is pulled to host
    FIRST as one `jax.device_get` transfer and Orbax is handed numpy
    arrays.  Orbax's own save path fetches every array from its
    thread pool; through the single-socket axon tunnel those concurrent
    D2H reads can deadlock the client (observed round 5: a 150-epoch
    campaign hung at its 13th periodic save with the .orbax-checkpoint-tmp
    frozen at 84 KB, and killing the stuck client wedged the far side).
    One batched synchronous fetch serializes the transfer and keeps
    Orbax's threads purely on local disk I/O.  Multi-process saves keep
    the sharded-array path (each process must write only its shards)."""
    payload = {"params": state.params,
               "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": state.step}
    if jax.process_count() == 1 and jax.default_backend() != "cpu":
        payload = jax.device_get(payload)
    mgr = _manager(logdir, max_to_keep)
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(logdir: str) -> int | None:
    if not osp.isdir(logdir):
        return None
    mgr = _manager(logdir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(logdir: str, state, epoch: int | None = None):
    """Restore a TrainState saved by `save_checkpoint` (exact resume)."""
    mgr = _manager(logdir)
    if epoch is None:
        epoch = mgr.latest_step()
        assert epoch is not None, f"no checkpoints in {logdir}"
    template = {"params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step}
    restored = mgr.restore(epoch,
                           args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def load_torch_weights(state, pth_path: str, stage_sizes=(3, 4, 6, 3)):
    """Warm-start model params (and BN stats) from a reference checkpoint;
    optimizer state is left fresh — the same semantics as train.py:214-219."""
    sd = tconvert.load_torch_state_dict(pth_path)
    params, batch_stats = tconvert.convert_relpose_gnn(sd, stage_sizes)
    written: set[str] = set()

    def _leaf_paths(tree, path=""):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out.extend(_leaf_paths(v, f"{path}{k}/"))
            else:
                out.append(f"{path}{k}")
        return out

    def _merge(dst, src, path=""):
        """Copy src leaves into dst tree (dst defines the full structure).
        Shapes must agree: a released checkpoint whose dims mismatch the
        built model (wrong --model-name/--feat-dim) silently merging and
        producing garbage medians is the worst failure mode, so check
        every leaf (tests/test_ckpt_schema.py)."""
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                # silently INSERTING unknown keys is the same failure as a
                # shape mismatch: flax apply ignores extra params, so e.g.
                # an R3/resnet34 checkpoint loaded into a resnet18 model
                # would drop layer blocks '2'..'5' on the floor and serve
                # a half-loaded model behind a 'loaded weights' log line
                raise ValueError(
                    f"checkpoint key {path}{k} does not exist in the "
                    "built model — the checkpoint was trained under a "
                    "different model config (wrong --backbone / "
                    "--feat-dim / stage_sizes?)")
            if isinstance(v, dict) != isinstance(out[k], dict):
                raise ValueError(
                    f"checkpoint structure mismatch at {path}{k}: "
                    f"{'subtree' if isinstance(v, dict) else 'leaf'} in "
                    "checkpoint vs "
                    f"{'subtree' if isinstance(out[k], dict) else 'leaf'} "
                    "in model")
            if isinstance(v, dict):
                out[k] = _merge(out[k], v, f"{path}{k}/")
            else:
                if hasattr(out[k], "shape") and hasattr(v, "shape") \
                        and out[k].shape != v.shape:
                    raise ValueError(
                        f"checkpoint shape mismatch at {path}{k}: model "
                        f"has {out[k].shape}, checkpoint has {v.shape} — "
                        "the checkpoint was trained under a different "
                        "model config")
                out[k] = jax.tree.map(
                    lambda s: np.asarray(s, np.float32), v)
                written.add(f"{path}{k}")
        return out

    def _merge_full(dst, src, what):
        """_merge + completeness: every leaf of the model tree must have
        been written by the checkpoint.  Unknown checkpoint keys already
        fail loudly (below); the INVERSE gap — a checkpoint that is a
        strict subset of the model, e.g. resnet18-shaped weights whose
        converted keys all exist with matching shapes inside a resnet34
        tree — would otherwise half-load silently behind a 'loaded
        weights' log line, with the uncovered blocks left at random
        init."""
        written.clear()
        out = _merge(dict(dst), src)
        missing = sorted(set(_leaf_paths(dst)) - written)
        if missing:
            raise ValueError(
                f"checkpoint does not cover the built model's {what}: "
                f"{len(missing)} leaves missing, first few "
                f"{missing[:6]} — the checkpoint was trained under a "
                "different model config (wrong --backbone / --feat-dim / "
                "stage_sizes?)")
        return out

    new_model = _merge_full(state.params["model"], params, "params")
    new_stats = _merge_full(state.batch_stats,
                            {"encoder": batch_stats["encoder"]},
                            "batch_stats")
    new_params = dict(state.params)
    new_params["model"] = new_model
    return state.replace(params=new_params, batch_stats=new_stats)


def save_torch_checkpoint(state, path: str, epoch: int,
                          stage_sizes=(3, 4, 6, 3), lr: float = 1e-4,
                          weight_decay: float = 5e-4) -> str:
    """Export a TrainState as a reference-schema `.pth.tar` — the exact
    inverse of `load_torch_weights`, so weights trained HERE are loadable
    (and third-party-verifiable) in the reference stack.

    Schema is byte-compatible with the reference save path
    (utils/utils.py:22-31):

        {'epoch': E, 'model_state_dict': <PoseNetX_R2 names>,
         'optim_state_dict': <torch.optim.Adam schema>,
         'criterion_state_dict': {'sax', 'saq'}}

    `optim_state_dict` carries the reference's three param groups
    (train.py:196-211: model params, criterion, criterion_R) with EMPTY
    per-param state — the same fresh-optimizer semantics the reference's
    own restore applies (train.py:214-219 loads model weights only; Adam
    moments are never restored).  Our optax moments have no torch-Adam
    serialization, and nothing downstream reads them.

    If `path` is a directory, the reference filename convention
    `epoch_{:03d}.pth.tar` (utils/utils.py:24) is applied inside it.
    Returns the written path."""
    import torch

    if osp.isdir(path):
        path = osp.join(path, "epoch_{:03d}.pth.tar".format(epoch))
    model_np = tconvert.export_relpose_gnn(state.params["model"],
                                           state.batch_stats, stage_sizes)
    model_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in model_np.items()}
    n_learnable = sum(1 for k in model_np
                      if not k.endswith(("running_mean", "running_var",
                                         "num_batches_tracked")))
    group_hp = dict(lr=lr, betas=(0.9, 0.999), eps=1e-8,
                    weight_decay=weight_decay, amsgrad=False)
    optim_sd = {"state": {},
                "param_groups": [
                    dict(group_hp, params=list(range(n_learnable))),
                    dict(group_hp, params=[n_learnable, n_learnable + 1]),
                    dict(group_hp,
                         params=[n_learnable + 2, n_learnable + 3])]}

    def crit_sd(name):
        c = state.params[name]
        return {"sax": torch.tensor(float(np.asarray(c["sax"]))),
                "saq": torch.tensor(float(np.asarray(c["saq"])))}

    torch.save({"epoch": int(epoch),
                "model_state_dict": model_sd,
                "optim_state_dict": optim_sd,
                "criterion_state_dict": crit_sd("criterion")}, path)
    return path


def load_vit_weights(state, pth_path: str, heads: int = 12,
                     grid_hw: tuple[int, int] | None = None):
    """Warm-start a ViT-backbone model's encoder from a timm/DINOv2-style
    checkpoint (models/convert.py::convert_vit).  The feat_dim projection
    head (`encoder/fc`) has no pretrained counterpart and stays at init;
    everything else must be covered exactly (same fail-loud contract as
    load_torch_weights).  `grid_hw` interpolates the checkpoint's
    pos_embed to the model's patch grid (required whenever the sizes
    differ — e.g. a 224px-trained table loaded at 256x341/p16 needs
    grid_hw=(16, 21))."""
    sd = tconvert.load_torch_state_dict(pth_path)
    params, layer_scale = tconvert.convert_vit(sd, heads=heads,
                                               grid_hw=grid_hw)
    enc = state.params["model"]["encoder"]
    if layer_scale and "ls1" not in enc.get("block0", {}):
        raise ValueError(
            "checkpoint carries DINOv2 LayerScale gammas but the model "
            "was built without them — set "
            "RelPoseGNNConfig.vit_layer_scale=True (or "
            "ViTEncoder.layer_scale=True) and rebuild")

    def leaf_paths(tree, path=""):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out.extend(leaf_paths(v, f"{path}{k}/"))
            else:
                out.append(f"{path}{k}")
        return out

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                raise ValueError(
                    f"checkpoint key {path}{k} does not exist in the "
                    "built ViT encoder — depth/width/layer-scale config "
                    "mismatch")
            if isinstance(v, dict):
                out[k] = merge(out[k], v, f"{path}{k}/")
            else:
                if tuple(out[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path}{k}: model "
                        f"{tuple(out[k].shape)} vs checkpoint "
                        f"{tuple(np.shape(v))}"
                        + (" — pass grid_hw to interpolate pos_embed"
                           if k == "pos_embed" else ""))
                out[k] = np.asarray(v, np.float32)
        return out

    new_enc = merge(enc, params)
    missing = sorted(set(leaf_paths(enc)) - set(leaf_paths(params)))
    if missing != ["fc/bias", "fc/kernel"]:
        raise ValueError(
            "checkpoint does not cover the built encoder: missing "
            f"{[m for m in missing if not m.startswith('fc/')][:6]} "
            "(only the from-scratch fc head may be uncovered)")
    new_model = dict(state.params["model"])
    new_model["encoder"] = new_enc
    new_params = dict(state.params)
    new_params["model"] = new_model
    return state.replace(params=new_params)
