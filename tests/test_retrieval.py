"""Retrieval tests: NetVLAD pooling math, subsampling semantics, VLAD."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.netvlad import NetVLAD, NetVLADEncoder
from relpose_gnn_tpu.retrieval import subsample
from relpose_gnn_tpu.retrieval.vlad import VLADIndex, vlad_aggregate


class TestNetVLAD:
    def _numpy_oracle(self, params, x):
        """Independent per-cluster-loop implementation of NetVLAD forward
        (vlad_net.py:65-89 semantics) in numpy, NHWC."""
        b, h, w, c = x.shape
        xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        kern = np.asarray(params["assign_conv"]["kernel"])  # [1,1,C,K]
        logits = xn @ kern[0, 0]                             # [B,H,W,K]
        k = logits.shape[-1]
        a = np.exp(logits - logits.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        a = a.reshape(b, h * w, k)
        xf = xn.reshape(b, h * w, c)
        cent = np.asarray(params["centroids"])
        vlad = np.zeros((b, k, c), np.float64)
        for ki in range(k):
            resid = xf - cent[ki]                            # [B,P,C]
            vlad[:, ki] = (resid * a[:, :, ki:ki + 1]).sum(1)
        vlad /= np.maximum(np.linalg.norm(vlad, axis=-1, keepdims=True),
                           1e-12)
        vlad = vlad.reshape(b, -1)
        return vlad / np.maximum(np.linalg.norm(vlad, axis=-1,
                                                keepdims=True), 1e-12)

    def test_matches_per_cluster_loop_oracle(self):
        m = NetVLAD(num_clusters=8, dim=16)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 4, 5, 16)).astype(np.float32)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(m.apply(variables, jnp.asarray(x)))
        want = self._numpy_oracle(variables["params"], x)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_output_is_unit_norm(self):
        m = NetVLAD(num_clusters=8, dim=16)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4, 4, 16)),
                        jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(variables, x))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-5)

    def test_encoder_output_dim(self):
        m = NetVLADEncoder(num_clusters=4, encoder_dim=512, dtype=None)
        x = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (1, 4 * 512)


class TestSubsample:
    def test_numpy_stride_semantics(self):
        rng = np.random.default_rng(0)
        idx = np.arange(100)
        out = subsample.subsample_ranked_numpy(idx, k=7, sampling_period=5,
                                               rng=rng)
        assert len(out) == 7
        assert len(set(out.tolist())) == 7

    def test_rank_and_filter(self):
        sim = np.array([0.1, 0.9, 0.5, 0.7])
        order = subsample.rank_and_filter_numpy(sim)
        np.testing.assert_array_equal(order, [1, 3, 2, 0])
        invalid = np.array([False, True, False, False])
        order2 = subsample.rank_and_filter_numpy(sim, invalid)
        np.testing.assert_array_equal(order2, [3, 2, 0])

    def test_jax_version_excludes_invalid(self):
        rng = jax.random.PRNGKey(0)
        m = 64
        sim = jnp.asarray(np.random.default_rng(2).random(m), jnp.float32)
        invalid = jnp.zeros(m, bool).at[5].set(True)
        for seed in range(5):
            out = np.asarray(subsample.subsample_neighbors(
                jax.random.PRNGKey(seed), sim, invalid, k=7,
                sampling_period=5))
            assert 5 not in out.tolist()
            assert out.shape == (7,)

    def test_jax_version_prefers_similar(self):
        # with sampling_period=1 and no dropout randomness the top-k ranked
        # survivors should skew to high similarity
        m = 128
        sim = jnp.asarray(np.linspace(0, 1, m), jnp.float32)
        invalid = jnp.zeros(m, bool)
        out = np.asarray(subsample.subsample_neighbors(
            jax.random.PRNGKey(3), sim, invalid, k=8, sampling_period=1))
        assert np.mean(sim[out]) > 0.7

    def test_windowed_batch_matches_full(self):
        # the top-C windowed fast path must be bit-exact vs the full-M
        # argsort path (same rng), including duplicated-similarity ties
        # (top_k's lower-index-first rule vs the stable sort)
        b, m = 8, 512
        rng = np.random.default_rng(11)
        sim = rng.random((b, m)).astype(np.float32)
        sim[:, ::3] = sim[:, 1::3][:, : sim[:, ::3].shape[1]]  # many ties
        sim = jnp.asarray(sim)
        invalid = jnp.zeros((m,), bool)
        for seed in range(4):
            rng = jax.random.PRNGKey(seed)
            full = subsample.subsample_neighbors_batch(
                rng, sim, invalid, k=7, sampling_period=5,
                candidates=None)
            # 1 and 30 exercise the clamp-to-k + round-up-to-chunk path
            # (a window that is not a whole mask-chunk multiple would
            # consume different drop-mask bits than the full path)
            for cand in (1, 30, 128, 256):
                win = subsample.subsample_neighbors_batch(
                    rng, sim, invalid, k=7, sampling_period=5,
                    candidates=cand)
                np.testing.assert_array_equal(np.asarray(full),
                                              np.asarray(win))

    def test_windowed_batch_rejects_nonpositive_candidates(self):
        sim = jnp.zeros((2, 64), jnp.float32)
        invalid = jnp.zeros((64,), bool)
        for bad in (0, -4):
            with pytest.raises(ValueError, match="candidates"):
                subsample.subsample_neighbors_batch(
                    jax.random.PRNGKey(0), sim, invalid, k=3,
                    sampling_period=2, candidates=bad)

    def test_windowed_batch_invalid_masks(self):
        # per-query invalid masks ride through the window path; a mask
        # heavy enough to starve the window triggers the exact full-M
        # fallback for the batch
        b, m = 4, 1024
        sim = jnp.asarray(
            np.random.default_rng(3).random((b, m)).astype(np.float32))
        invalid = np.zeros((b, m), bool)
        invalid[0, :100] = True          # top-heavy exclusions
        invalid[1, ::2] = True
        invalid[2, :1000] = True         # starves a 256-wide window
        rng = jax.random.PRNGKey(5)
        full = subsample.subsample_neighbors_batch(
            rng, sim, jnp.asarray(invalid), k=7, sampling_period=3,
            candidates=None)
        win = subsample.subsample_neighbors_batch(
            rng, sim, jnp.asarray(invalid), k=7, sampling_period=3,
            candidates=256)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(win))
        # excluded entries never served
        for q in range(b):
            assert not invalid[q][np.asarray(win)[q]].any()

    def test_windowed_batch_under_jit(self):
        # the batch-level lax.cond must trace inside jit (the service path)
        b, m = 4, 1024
        sim = jnp.asarray(
            np.random.default_rng(9).random((b, m)).astype(np.float32))
        invalid = jnp.zeros((m,), bool)
        rng = jax.random.PRNGKey(2)
        f = jax.jit(lambda r, s: subsample.subsample_neighbors_batch(
            r, s, invalid, 7, 5, candidates=64))
        np.testing.assert_array_equal(
            np.asarray(f(rng, sim)),
            np.asarray(subsample.subsample_neighbors_batch(
                rng, sim, invalid, 7, 5, candidates=None)))

    def test_cosine_topk(self):
        rng = np.random.default_rng(4)
        db = rng.normal(size=(50, 32)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = db[[7, 13]] + rng.normal(size=(2, 32)).astype(np.float32) * 0.01
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scores, idx = subsample.cosine_topk(jnp.asarray(db), jnp.asarray(q),
                                            k=3)
        assert idx[0, 0] == 7 and idx[1, 0] == 13
        assert (np.diff(np.asarray(scores), axis=1) <= 0).all()


class TestClassicalVLAD:
    def test_vlad_aggregate_matches_loop(self):
        rng = np.random.default_rng(5)
        descs = rng.normal(size=(40, 8)).astype(np.float32)
        centers = rng.normal(size=(4, 8)).astype(np.float32)
        got = np.asarray(vlad_aggregate(jnp.asarray(descs),
                                        jnp.asarray(centers)))
        # loop oracle (VLAD.py:177-203 semantics)
        d2 = ((descs[:, None] - centers[None]) ** 2).sum(-1)
        labels = d2.argmin(1)
        V = np.zeros((4, 8))
        for i in range(4):
            sel = descs[labels == i]
            if len(sel):
                V[i] = (sel - centers[i]).sum(0)
        V = V.flatten()
        V = np.sign(V) * np.sqrt(np.abs(V))
        V = V / np.linalg.norm(V)
        np.testing.assert_allclose(got, V, atol=1e-5)

    def test_index_query_returns_self(self):
        rng = np.random.default_rng(6)
        centers = rng.normal(size=(4, 8)).astype(np.float32)
        per_image = [rng.normal(size=(30, 8)).astype(np.float32)
                     for _ in range(10)]
        index = VLADIndex(centers=centers)
        index.build(per_image)
        _, idx = index.query(per_image[3], k=3)
        assert idx[0] == 3

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(7)
        index = VLADIndex(centers=rng.normal(size=(4, 8)).astype(np.float32))
        index.build([rng.normal(size=(20, 8)).astype(np.float32)
                     for _ in range(3)])
        p = str(tmp_path / "vlad.pkl")
        index.save(p)
        loaded = VLADIndex.load(p)
        np.testing.assert_array_equal(loaded.descriptors, index.descriptors)


class TestVLADExport:
    def _index(self, tmp_path, m=5, d=8):
        rng = np.random.default_rng(8)
        index = VLADIndex(centers=rng.normal(size=(2, d)).astype(np.float32))
        index.build([rng.normal(size=(12, d)).astype(np.float32)
                     for _ in range(m)])
        p = str(tmp_path / "vlad.pkl")
        index.save(p)
        with open(p + ".paths.txt", "w") as f:
            f.write("\n".join(f"img{i}.png" for i in range(m)))
        return p, np.asarray(index.descriptors, np.float64)

    def test_distances_matches_scipy(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo/cli")
        import vlad_export
        from scipy.spatial.distance import cdist

        p, V = self._index(tmp_path)
        out = str(tmp_path / "dist")
        vlad_export.main(["--index", p, "--output", out,
                          "--format", "distances"])
        got = np.loadtxt(out + ".txt", delimiter=",")
        np.testing.assert_allclose(got, cdist(V, V), atol=1e-4)

    def test_csv_and_prj_layouts(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo/cli")
        import vlad_export

        p, V = self._index(tmp_path, m=3, d=4 * 2)
        csv_out = str(tmp_path / "v.csv")
        vlad_export.main(["--index", p, "--output", csv_out,
                          "--format", "csv"])
        lines = open(csv_out).read().strip().split("\n")
        assert len(lines) == 3
        first = lines[0].split(",")
        assert first[0] == "img0.png"
        np.testing.assert_allclose([float(x) for x in first[1:]], V[0])

        prj_out = str(tmp_path / "v.prj")
        vlad_export.main(["--index", p, "--output", prj_out,
                          "--format", "prj", "--scale"])
        lines = open(prj_out).read().strip().split("\n")
        # DY header, count, dim, feature-name row, then M data rows
        # (VLADtoPRJ.py:50-67)
        assert lines[0] == "DY" and lines[1] == "3" and lines[2] == "16"
        assert lines[3].split(";") == [str(i) for i in range(17)]
        row = lines[4].split(";")
        assert row[0] == "img0.png.txt" and row[-1] == "0.0"
        vals = np.asarray([line.split(";")[1:-1] for line in lines[4:]],
                          np.float64)
        assert vals.min() >= 0.0 and vals.max() <= 1.0  # min-max scaled


class TestNetVLADPreprocess:
    def test_raw_frame_geometry(self):
        import numpy as np
        from relpose_gnn_tpu.retrieval.netvlad_index import (
            netvlad_preprocess_7scenes)
        rng = np.random.default_rng(0)
        raw = rng.random((480, 640, 3)).astype(np.float32)
        out = netvlad_preprocess_7scenes(raw)
        assert out.shape == (192, 256, 3)
        # ImageNet-normalized range
        assert out.min() > -3 and out.max() < 3

    def test_resized_frame_skips_crop(self):
        import numpy as np
        from relpose_gnn_tpu.retrieval.netvlad_index import (
            netvlad_preprocess_7scenes)
        x = np.random.default_rng(1).random((256, 341, 3)).astype(np.float32)
        out = netvlad_preprocess_7scenes(x)
        assert out.shape == (192, 256, 3)
