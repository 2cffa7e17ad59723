"""CLI-level test of the on-device relocalization service (cli/serve.py):
database build + batched query serving on a synthetic raw scene."""

import os.path as osp
import sys

import numpy as np

from test_data import write_7scenes_fixture

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "cli"))
import serve  # noqa: E402  (cli/serve.py)


class TestServeCLI:
    def test_end_to_end_smoke(self, tmp_path, capsys):
        """--batch-size 3 against 4 test queries deliberately exercises
        the ragged-tail machinery in _make_query_batches (the tail batch
        pads to the full batch size by repeating the last real frame and
        the output is trimmed back) — the export must hold exactly the
        real query count, no pad rows."""
        raw = str(tmp_path / "raw")
        write_7scenes_fixture(raw, scene="chess", n_seqs=2, n_frames=4,
                              train=True, size=(40, 32))
        write_7scenes_fixture(raw, scene="chess", n_seqs=1, n_frames=4,
                              train=False, size=(40, 32))
        out = str(tmp_path / "poses.npz")
        err = serve.main([
            "--dataset", "7Scenes", "--scene", "chess",
            "--data-path", raw, "--seq-len", "4",
            "--image-size", "32", "--batch-size", "3",
            "--backbone", "resnet18", "--feat-dim", "32",
            "--dtype", "float32", "--retrieval-hw", "24", "32",
            "--netvlad-clusters", "4", "--deterministic",
            "--out", out])
        printed = capsys.readouterr().out
        assert "building database" in printed and "q/s" in printed
        assert np.isfinite(err.median_t) and np.isfinite(err.median_q)
        z = np.load(out)
        assert z["pose6"].shape[1] == 6
        assert len(z["pose6"]) == 4  # trimmed to the real query count
        # unit quaternions in the export
        np.testing.assert_allclose(
            np.linalg.norm(z["abs_q"], axis=1), 1.0, atol=1e-5)

    def test_multiscene_single_compile(self, tmp_path, capsys):
        """Several scenes serve through ONE compiled query executable
        (MultiSceneService): the CLI's proof line must report exactly
        one compile, and every scene gets its own error report + npz."""
        raw = str(tmp_path / "raw")
        for scene in ("chess", "fire"):
            write_7scenes_fixture(raw, scene=scene, n_seqs=2, n_frames=4,
                                  train=True, size=(40, 32))
            write_7scenes_fixture(raw, scene=scene, n_seqs=1, n_frames=4,
                                  train=False, size=(40, 32))
        out = str(tmp_path / "poses.npz")
        results = serve.main([
            "--dataset", "7Scenes", "--scene", "chess", "fire",
            "--data-path", raw, "--seq-len", "4",
            "--image-size", "32", "--batch-size", "4",
            "--backbone", "resnet18", "--feat-dim", "32",
            "--dtype", "float32", "--retrieval-hw", "24", "32",
            "--netvlad-clusters", "4", "--deterministic",
            "--out", out])
        printed = capsys.readouterr().out
        assert ("query program compiles: 1 (one shared executable "
                "across 2 scenes)") in printed
        assert sorted(results) == ["chess", "fire"]
        for scene in ("chess", "fire"):
            err = results[scene]
            assert np.isfinite(err.median_t) and np.isfinite(err.median_q)
            z = np.load(str(tmp_path / f"poses_{scene}.npz"))
            assert z["pose6"].shape[1] == 6 and len(z["pose6"]) > 0
