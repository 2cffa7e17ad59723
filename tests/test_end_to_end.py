"""End-to-end integration: raw synthetic scene -> graph build -> train ->
checkpoint -> resume -> eval, all through the public CLI-level APIs."""

import os.path as osp

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_data import write_7scenes_fixture

from relpose_gnn_tpu.data.graph_builder import GraphBuilderConfig, build_graphs
from relpose_gnn_tpu.data.packed import PackedGraphDataset
from relpose_gnn_tpu.data.pipeline import data_iterator, device_prefetch
from relpose_gnn_tpu.data.seven_scenes import SevenScenes
from relpose_gnn_tpu.evaluation.evaluator import (compute_pose_errors,
                                                  save_poses)
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.training import checkpoints as ckpt
from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                              create_train_state,
                                              make_eval_step,
                                              make_train_step)


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    raw = str(root / "raw")
    write_7scenes_fixture(raw, scene="chess", n_seqs=2, n_frames=5,
                          train=True, size=(40, 32))
    write_7scenes_fixture(raw, scene="chess", n_seqs=1, n_frames=4,
                          train=False, size=(40, 32))
    return root, raw


def test_full_pipeline(pipeline_dirs):
    root, raw = pipeline_dirs
    train_q = SevenScenes("chess", raw, train=True, image_size=32)
    test_q = SevenScenes("chess", raw, train=False, image_size=32)

    n_nodes = 4
    cfg = GraphBuilderConfig(seq_len=n_nodes, retrieval_mode="RAND", seed=0)
    train_root = str(root / "chess_fc4_sp5_train")
    test_root = str(root / "chess_fc4_sp5_test")
    n_train = build_graphs(train_q, train_q, train_root, cfg,
                           height=32, width=40)
    n_test = build_graphs(test_q, train_q, test_root, cfg,
                          height=32, width=40)
    # TestSplit points at seq-01, which holds 5 frames (written by the train
    # fixture first; the parser counts pose files per sequence directory)
    assert n_train == 10 and n_test == 5

    train_ds = PackedGraphDataset(train_root)
    test_ds = PackedGraphDataset(test_root)

    mcfg = RelPoseGNNConfig(num_nodes=n_nodes, feat_dim=32, edge_dim=32,
                            node_dim=32, knn=2, backbone="resnet18",
                            droprate=0.0)
    model = RelPoseGNN(mcfg)
    tcfg = TrainerConfig(lr=1e-3, steps_per_epoch=2)

    sample = train_ds.batch(np.arange(2))
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                               jnp.asarray(sample["images"], jnp.float32),
                               jnp.asarray(sample["adj"]))
    train_step = make_train_step(tcfg)
    rng = jax.random.PRNGKey(1)
    for epoch in range(2):
        it = data_iterator(train_ds, batch_size=5, seed=epoch, epochs=1)
        for batch in device_prefetch(it, train_ds.mean, train_ds.std):
            state, metrics = train_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))

    # checkpoint + exact resume
    ckpt_dir = str(root / "ckpt")
    ckpt.save_checkpoint(ckpt_dir, state, epoch=1)
    state2 = create_train_state(jax.random.PRNGKey(7), model, tcfg,
                                jnp.asarray(sample["images"], jnp.float32),
                                jnp.asarray(sample["adj"]))
    state2 = ckpt.restore_checkpoint(ckpt_dir, state2)
    assert int(state2.step) == int(state.step)
    l1 = jax.tree.leaves(state.params["model"])
    l2 = jax.tree.leaves(state2.params["model"])
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval + npz export
    eval_step = make_eval_step()
    it = data_iterator(test_ds, batch_size=2, shuffle=False, epochs=1,
                       drop_remainder=False)
    preds, targs = [], []
    for batch in device_prefetch(it, test_ds.mean, test_ds.std):
        out = eval_step(state2, batch)
        preds.append(np.asarray(out["pred"]))
        targs.append(np.asarray(out["target"]))
    err = compute_pose_errors(np.concatenate(preds), np.concatenate(targs))
    assert np.isfinite(err.median_t) and np.isfinite(err.median_q)
    path = save_poses(str(root / "preds"), "chess", err)
    assert osp.isfile(path)
    loaded = np.load(path)
    assert loaded["abs_t"].shape == (5, 3) and loaded["abs_q"].shape == (5, 4)


def test_torch_warm_start(pipeline_dirs, tmp_path):
    """Reference-checkpoint warm start through the converter (.pth.tar)."""
    torch = pytest.importorskip("torch")
    from torch_ref import TorchResNet

    root, raw = pipeline_dirs
    d = 32
    tm = TorchResNet((2, 2, 2, 2), feat_dim=d)
    sd = {}
    for k, v in tm.state_dict().items():
        sd[f"feature_extractor.{k}"] = v
    rng = np.random.default_rng(0)

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(size=(cout, cin)).astype(np.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(size=cout).astype(np.float32))

    lin("proj_edge", 2 * d, d)
    lin("gnn1.edge_model.edge_mlp.0", 3 * d, d)
    lin("gnn1.edge_model.edge_mlp.2", d, d)
    lin("gnn1.mlp.0", 2 * d, d)
    lin("gnn1.mlp.2", d, d)
    lin("gnn1.mlp_updating.0", 2 * d, d)
    lin("gnn1.mlp_updating.2", d, d)
    for a in ("g", "theta", "phi"):
        lin(f"gnn1.att.{a}", d, d // 8)
    lin("gnn1.att.W", d // 8, d)
    for head in ("fc_xyz", "fc_wpqr", "fc_xyz_R", "fc_wpqr_R"):
        lin(head, d, 3)

    pth = str(tmp_path / "epoch_039.pth.tar")
    torch.save({"epoch": 39, "model_state_dict": sd}, pth)

    mcfg = RelPoseGNNConfig(num_nodes=4, feat_dim=d, edge_dim=d, node_dim=d,
                            knn=2, backbone="resnet18", droprate=0.0)
    model = RelPoseGNN(mcfg)
    tcfg = TrainerConfig(steps_per_epoch=2)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tcfg,
        jnp.ones((1, 4, 32, 40, 3)), jnp.ones((1, 4, 4), bool))
    state = ckpt.load_torch_weights(state, pth, stage_sizes=(2, 2, 2, 2))

    got = np.asarray(
        state.params["model"]["proj_edge"]["kernel"])
    want = sd["proj_edge.weight"].numpy().T
    np.testing.assert_array_equal(got, want)
    # model still runs after warm start
    out = make_eval_step()(state, {
        "images": jnp.ones((2, 4, 32, 40, 3)),
        "poses": jnp.zeros((2, 4, 6)),
        "adj": jnp.ones((2, 4, 4), bool)})
    assert np.isfinite(np.asarray(out["pred"])).all()


def test_learns_to_relocalize():
    """Training on the learnable synthetic task must reduce the actual
    relocalization error (not just the loss): after a few hundred steps the
    median translation error on held-out graphs drops well below the
    untrained model's."""
    import jax
    import jax.numpy as jnp
    from relpose_gnn_tpu.data.synthetic import synthetic_batch
    from relpose_gnn_tpu.evaluation.evaluator import compute_pose_errors
    from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
    from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                                  create_train_state,
                                                  make_eval_step,
                                                  make_train_step)

    cfg = RelPoseGNNConfig(num_nodes=4, feat_dim=32, edge_dim=32,
                           node_dim=32, knn=0, backbone="resnet18",
                           droprate=0.0)
    model = RelPoseGNN(cfg)
    tcfg = TrainerConfig(lr=1e-3, steps_per_epoch=50, weight_decay=0.0)

    rng = np.random.default_rng(0)
    train_batches = [jax.tree.map(jnp.asarray, synthetic_batch(
        rng, batch_size=8, num_nodes=4, height=32, width=40,
        learnable=True)) for _ in range(4)]
    test_batch = jax.tree.map(jnp.asarray, synthetic_batch(
        rng, batch_size=16, num_nodes=4, height=32, width=40,
        learnable=True))

    state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                               train_batches[0]["images"],
                               train_batches[0]["adj"])
    # knn=0 -> reference anchors on the first construction-order edge into
    # node 0 (node 1 for fc graphs); also makes the metric measure pure
    # edge-regression improvement under a deterministic anchor
    eval_step = make_eval_step(static_anchor=1)

    def median_t(state):
        out = eval_step(state, test_batch)
        err = compute_pose_errors(np.asarray(out["pred"]),
                                  np.asarray(out["target"]))
        return err.median_t

    before = median_t(state)
    step = make_train_step(tcfg)
    key = jax.random.PRNGKey(1)
    for i in range(150):
        state, m = step(state, train_batches[i % 4], key)
    after = median_t(state)
    # 150 CPU steps on the toy task: expect a clear (if partial) error
    # reduction — the real 2x+ gains need the full 200-epoch schedule
    assert after < before * 0.9, (before, after)
