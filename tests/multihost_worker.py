"""Worker for tests/test_multihost.py: one process of a 2-process CPU job.

Usage: python multihost_worker.py <process_id> <coordinator> <graphs_dir>
       <out_dir> [<num_processes>]

With num_processes=2 (default): joins the 2-process gloo job with 4
virtual CPU devices each (global mesh dp=8) and runs the full
`run_training` on the shared fixture.  With num_processes=1: the same
dp=8 training in ONE process with 8 virtual devices — the reference run
(the parent compares the two metrics.jsonl files; running the reference
in a subprocess too keeps the pytest parent jax-idle, which matters on a
1-core host where a third loaded runtime starves the gloo rendezvous).
NOT a pytest file (no test_ prefix): it is spawned as a subprocess.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# same collective-timeout guards as conftest.py: participants time-slice
# one core, so the 40 s XLA:CPU rendezvous default is flaky by construction
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=180"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, coordinator, graphs, out_dir = (int(sys.argv[1]), sys.argv[2],
                                         sys.argv[3], sys.argv[4])
    nproc = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else ""  # SHARED storage
    mesh_data = int(sys.argv[7]) if len(sys.argv) > 7 else 8
    mesh_model = int(sys.argv[8]) if len(sys.argv) > 8 else 1
    from relpose_gnn_tpu.parallel.multihost import initialize
    initialize(coordinator, num_processes=nproc, process_id=pid,
               local_device_count=8 // nproc)
    import jax
    if nproc == 1:  # initialize() no-ops; set the virtual devices here
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_default_matmul_precision", "highest")
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from relpose_gnn_tpu.training.experiment import (ExperimentConfig,
                                                     run_training)
    cfg = ExperimentConfig(
        dataset="7Scenes", experiment=2, train_scene="chess",
        test_scene="chess", train_data_dir=graphs + "/",
        test_data_dir=graphs + "/", exp_name="mh", model_name="R3",
        backbone="resnet18", feat_dim=32, batch_size=8, seq_len=8,
        max_epoch=2, eval_after_epoch=-1, dtype="float32", knn=2,
        allow_random_init=True, save_dir=out_dir, mesh_data=mesh_data,
        mesh_model=mesh_model, ckpt_epochs=(1,), ckpt_dir=ckpt_dir)
    # eval_after_epoch=-1: the in-loop eval runs every epoch, exercising
    # evaluate_scene -> host_read (process_allgather) under the 2-process
    # mesh; the parent compares the printed medians across legs
    out = run_training(cfg)
    b = out["best"]["chess"]
    print(f"BEST chess {b['median_t']:.9f} {b['median_q']:.9f}", flush=True)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
