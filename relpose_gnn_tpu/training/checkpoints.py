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
    """Persist the full train state under `logdir/<epoch>/`."""
    mgr = _manager(logdir, max_to_keep)
    payload = {"params": state.params,
               "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": state.step}
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
