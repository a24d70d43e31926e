import jax
import jax.numpy as jnp
import numpy as np

from weiner_slamit_v2_tpu.bow import vocabulary as voc
from weiner_slamit_v2_tpu.bow.database import (
    KeyframeDatabase,
    add_keyframe_bow,
    erase_keyframe_bow,
    query_candidates,
)


def random_descriptors(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


def corpus_with_clusters(rng, n_clusters=20, per_cluster=50, flip_bits=8):
    """Descriptors forming distinct Hamming clusters."""
    centers = rng.integers(0, 2**32, (n_clusters, 8), dtype=np.uint32)
    out = []
    labels = []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = centers[c].copy()
            for _ in range(flip_bits):
                w = rng.integers(0, 8)
                b = rng.integers(0, 32)
                d[w] ^= np.uint32(1) << np.uint32(b)
            out.append(d)
            labels.append(c)
    return jnp.asarray(np.stack(out)), np.asarray(labels)


class TestVocabulary:
    def test_train_and_transform_clusters(self):
        rng = np.random.default_rng(0)
        desc, labels = corpus_with_clusters(rng)
        valid = jnp.ones(desc.shape[0], bool)
        vocab = voc.train_vocabulary(
            desc, valid, jax.random.PRNGKey(0), branching=5, depth=3
        )
        words, groups = voc.transform(vocab, desc, valid)
        words = np.asarray(words)
        # same-cluster descriptors should mostly map to the same word
        agree = 0
        for c in np.unique(labels):
            w = words[labels == c]
            agree += (w == np.bincount(w).argmax()).mean()
        agree /= len(np.unique(labels))
        assert agree > 0.8, f"cluster purity {agree}"

    def test_bow_vector_normalized(self):
        rng = np.random.default_rng(1)
        desc, _ = corpus_with_clusters(rng, n_clusters=5, per_cluster=20)
        valid = jnp.ones(desc.shape[0], bool)
        vocab = voc.train_vocabulary(
            desc, valid, jax.random.PRNGKey(1), branching=4, depth=3
        )
        words, _ = voc.transform(vocab, desc[:64], valid[:64])
        v = voc.bow_vector(vocab, words)
        assert abs(float(v.sum()) - 1.0) < 1e-5
        assert float(v.min()) >= 0.0

    def test_l1_score_properties(self):
        rng = np.random.default_rng(2)
        desc, _ = corpus_with_clusters(rng, n_clusters=5, per_cluster=30)
        valid = jnp.ones(desc.shape[0], bool)
        vocab = voc.train_vocabulary(
            desc, valid, jax.random.PRNGKey(2), branching=4, depth=3
        )
        w1, _ = voc.transform(vocab, desc[:50], valid[:50])
        w2, _ = voc.transform(vocab, desc[50:100], valid[:50])
        v1 = voc.bow_vector(vocab, w1)
        v2 = voc.bow_vector(vocab, w2)
        s_self = float(voc.l1_score(v1, v1))
        s_cross = float(voc.l1_score(v1, v2))
        assert abs(s_self - 2.0) < 1e-4  # identical normalized vectors
        assert s_cross < s_self

    def test_invalid_descriptors_ignored(self):
        rng = np.random.default_rng(3)
        desc = random_descriptors(rng, 32)
        valid = jnp.arange(32) < 16
        vocab = voc.train_vocabulary(
            desc, jnp.ones(32, bool), jax.random.PRNGKey(3), branching=3, depth=2
        )
        words, _ = voc.transform(vocab, desc, valid)
        assert (np.asarray(words)[16:] == -1).all()


class TestDatabase:
    def _setup(self):
        rng = np.random.default_rng(4)
        desc, labels = corpus_with_clusters(rng, n_clusters=8, per_cluster=40)
        valid = jnp.ones(desc.shape[0], bool)
        vocab = voc.train_vocabulary(
            desc, valid, jax.random.PRNGKey(4), branching=4, depth=3
        )
        return rng, desc, labels, vocab

    def test_query_finds_similar_keyframe(self):
        rng, desc, labels, vocab = self._setup()
        n_kf = 6
        db = KeyframeDatabase.create(8, vocab.n_words)
        # each "keyframe" sees 2 clusters; kf 0 and kf 5 see the same ones
        views = [(0, 1), (2, 3), (4, 5), (6, 7), (1, 2), (0, 1)]
        vecs = []
        for k, (a, b) in enumerate(views):
            sel = np.nonzero((labels == a) | (labels == b))[0][:60]
            w, _ = voc.transform(vocab, desc[sel], jnp.ones(len(sel), bool))
            v = voc.bow_vector(vocab, w)
            vecs.append(v)
            db = add_keyframe_bow(db, jnp.asarray(k), v)

        covis = jnp.zeros((8, 8), jnp.float32)
        exclude = jnp.zeros(8, bool).at[5].set(True)  # querying for kf5
        acc, keep = query_candidates(db, vecs[5], exclude, covis)
        keep = np.asarray(keep)
        assert keep[0], "kf0 (same content) must be a candidate"
        assert not keep[5]

    def test_erase(self):
        rng, desc, labels, vocab = self._setup()
        db = KeyframeDatabase.create(4, vocab.n_words)
        w, _ = voc.transform(vocab, desc[:40], jnp.ones(40, bool))
        v = voc.bow_vector(vocab, w)
        db = add_keyframe_bow(db, jnp.asarray(0), v)
        assert bool(db.has_entry[0])
        db = erase_keyframe_bow(db, jnp.asarray(0))
        assert not bool(db.has_entry[0])
        assert float(db.bow[0].sum()) == 0.0


class TestPnP:
    def test_ransac_pnp_with_outliers(self):
        from weiner_slamit_v2_tpu.geometry import se3
        from weiner_slamit_v2_tpu.geometry.camera import Camera
        from weiner_slamit_v2_tpu.optim.pnp import ransac_pnp

        rng = np.random.default_rng(5)
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        K = jnp.asarray(np.asarray(cam.K), jnp.float32)
        n = 100
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
            axis=1,
        ).astype(np.float32)
        T_true = se3.exp(jnp.asarray([0.2, -0.1, 0.15, 0.05, 0.1, -0.03]))
        uv = np.array(cam.project(se3.apply(T_true, jnp.asarray(X))))
        uv += rng.normal(0, 0.5, uv.shape)
        uv[:30] += rng.uniform(30, 120, (30, 2))  # 30% outliers
        Tcw, inl, n_inl = ransac_pnp(
            jnp.asarray(X), jnp.asarray(uv, jnp.float32), jnp.ones(n, bool),
            jnp.ones(n), K, jax.random.PRNGKey(0),
        )
        # a minimal-sample model is inexact under noise; it must capture a
        # solid majority of the inliers and almost no outliers, and the
        # subsequent pose refinement (as used by Relocalization) must land
        # on the true pose
        assert int(n_inl) > 40
        inl_np = np.asarray(inl)
        assert inl_np[:30].sum() < 5
        from weiner_slamit_v2_tpu.optim.pose_opt import optimize_pose

        # refine on all matches: the chi2 reclassification recovers inliers
        # the minimal model missed and rejects the gross outliers
        T_ref, inl2, n2 = optimize_pose(
            Tcw, jnp.asarray(X), jnp.asarray(uv, jnp.float32), jnp.ones(n),
            jnp.ones(n, bool), K,
        )
        err = np.asarray(se3.log(se3.inv(T_true) @ T_ref))
        assert np.abs(err).max() < 0.02, err
        assert int(n2) > 60
        assert np.asarray(inl2)[:30].sum() < 3


class TestSim3:
    def test_horn_exact(self):
        from weiner_slamit_v2_tpu.geometry import se3, sim3
        from weiner_slamit_v2_tpu.optim.sim3_solver import horn_sim3

        rng = np.random.default_rng(6)
        P2 = jnp.asarray(rng.uniform(-2, 2, (10, 3)).astype(np.float32))
        S_true = sim3.from_rts(
            se3.so3_exp(jnp.asarray([0.3, -0.2, 0.5])),
            jnp.asarray([1.0, -0.5, 2.0]),
            1.7,
        )
        P1 = sim3.apply(S_true, P2)
        S = horn_sim3(P1, P2)
        np.testing.assert_allclose(np.asarray(S), np.asarray(S_true), atol=1e-4)

    def test_ransac_sim3(self):
        from weiner_slamit_v2_tpu.geometry import se3, sim3
        from weiner_slamit_v2_tpu.geometry.camera import Camera
        from weiner_slamit_v2_tpu.optim.sim3_solver import ransac_sim3

        rng = np.random.default_rng(7)
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        K = jnp.asarray(np.asarray(cam.K), jnp.float32)
        n = 80
        # points in camera-2 frame, in front of both cameras
        X2 = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(3, 6, n)],
            axis=1,
        ).astype(np.float32)
        S_true = sim3.from_rts(
            se3.so3_exp(jnp.asarray([0.05, -0.1, 0.02])),
            jnp.asarray([0.3, 0.1, 0.2]),
            1.25,
        )
        X1 = np.array(sim3.apply(S_true, jnp.asarray(X2)))
        # corrupt 25%
        X1[:20] += rng.uniform(0.5, 2.0, (20, 3))
        uv1 = cam.project(jnp.asarray(X1))
        uv2 = cam.project(jnp.asarray(X2))
        S, inl, n_inl = ransac_sim3(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones(n, bool), uv1, uv2,
            jnp.ones(n), jnp.ones(n), K, jax.random.PRNGKey(1),
        )
        assert int(n_inl) >= 50
        s_est = float(np.linalg.norm(np.asarray(S)[0, :3]))
        assert abs(s_est - 1.25) < 0.02


class TestPoseGraph:
    def test_closes_a_drifted_loop(self):
        """Odometry chain with accumulated drift + one loop edge back to the
        start; the pose graph must distribute the correction."""
        from weiner_slamit_v2_tpu.geometry import se3, sim3
        from weiner_slamit_v2_tpu.optim.pose_graph import optimize_pose_graph

        Kn = 12
        # ground truth: cameras on a circle (closed loop)
        gt = []
        for k in range(Kn):
            a = 2 * np.pi * k / Kn
            xi = jnp.asarray(
                [np.sin(a), 1 - np.cos(a), 0.0, 0.0, 0.0, a], jnp.float32
            )
            gt.append(se3.exp(xi))
        gt = jnp.stack(gt)
        # odometry measurements with drift: relative poses perturbed
        rng = np.random.default_rng(8)
        rels = []
        for k in range(Kn - 1):
            S_ji = gt[k + 1] @ se3.inv(gt[k])
            noise = jnp.asarray(
                np.concatenate([rng.normal(0, 0.02, 6), [0.0]]), jnp.float32
            )
            rels.append(sim3.exp(noise) @ S_ji)
        # integrate drifted initial estimates
        est = [gt[0]]
        for k in range(Kn - 1):
            est.append(rels[k] @ est[k])
        est = jnp.stack(est)
        drift0 = float(jnp.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3]))

        edge_i = list(range(Kn - 1)) + [Kn - 1]
        edge_j = list(range(1, Kn)) + [0]
        edge_S = rels + [gt[0] @ se3.inv(gt[Kn - 1])]  # exact loop edge
        fixed = jnp.zeros(Kn, bool).at[0].set(True)
        S_opt = optimize_pose_graph(
            est, jnp.ones(Kn, bool), fixed,
            jnp.asarray(edge_i, jnp.int32), jnp.asarray(edge_j, jnp.int32),
            jnp.stack(edge_S), jnp.ones(Kn, bool),
        )
        drift1 = float(jnp.linalg.norm(S_opt[-1][:3, 3] - gt[-1][:3, 3]))
        assert drift1 < 0.5 * drift0, (drift0, drift1)
        # scales stay near 1 (SE3-like loop)
        for k in range(Kn):
            assert abs(float(sim3.scale_of(S_opt[k])) - 1.0) < 0.1


class TestPretrainedVocabulary:
    """DBoW2 text-format vocabulary embedding (TemplatedVocabulary.h:1345-
    1440 -> implicit complete tree) and the sparse database it needs at
    ORBvoc scale."""

    def _train_small(self, seed=0, k=3, L=2):
        rng = np.random.default_rng(seed)
        desc, _ = corpus_with_clusters(rng, n_clusters=9, per_cluster=40)
        v = voc.train_vocabulary(
            desc, jnp.ones(desc.shape[0], bool), jax.random.PRNGKey(1),
            branching=k, depth=L,
        )
        return v, desc

    def test_roundtrip_through_dbow2_text(self, tmp_path):
        vocab, desc = self._train_small()
        path = str(tmp_path / "voc.txt")
        voc.save_dbow2_text(vocab, path)
        vocab2 = voc.vocabulary_from_dbow2(path)
        assert vocab2.branching == vocab.branching
        assert vocab2.depth == vocab.depth
        q = desc[::7]
        ok = jnp.ones(q.shape[0], bool)
        w1, g1 = voc.transform(vocab, q, ok)
        w2, g2 = voc.transform(vocab2, q, ok)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        # idf survives (word weights written for leaves)
        i1 = np.asarray(vocab.word_idf)
        i2 = np.asarray(vocab2.word_idf)
        valid_words = np.asarray(vocab.level_valid[vocab.depth - 1])
        np.testing.assert_allclose(i1[valid_words], i2[valid_words], atol=1e-5)

    def test_incomplete_tree_with_shallow_leaves(self, tmp_path):
        """Leaves above the final level (the general ORBvoc case) are
        propagated down as single-child chains: descent still terminates at
        a final-level word carrying the leaf's weight."""
        # hand-built k=2 L=2 file: root has 2 children; child 1 is a LEAF at
        # level 1 (no children); child 2 has two leaf children
        d_a = " ".join(["255"] + ["0"] * 31)   # descriptor A: first byte ff
        d_b = " ".join(["0"] * 32)             # descriptor B: zeros
        d_c = " ".join(["15"] + ["0"] * 31)    # descriptor C: 0x0f
        lines = [
            "2 2 0 0",
            f"0 1 {d_a} 0.7",   # node 1: leaf at level 1 (desc A)
            f"0 0 {d_b} 0",     # node 2: internal (desc B)
            f"2 1 {d_b} 0.4",   # node 3: leaf (desc B)
            f"2 1 {d_c} 0.3",   # node 4: leaf (desc C)
        ]
        path = str(tmp_path / "incomplete.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        v = voc.vocabulary_from_dbow2(path)
        # query near A must land on A's propagated word with weight 0.7
        qa = np.zeros((1, 8), np.uint32)
        qa[0, 0] = 255
        w, _ = voc.transform(v, jnp.asarray(qa), jnp.ones(1, bool))
        wa = int(w[0])
        assert float(v.word_idf[wa]) == np.float32(0.7)
        # query of zeros lands on B-leaf word (weight 0.4)
        qb = np.zeros((1, 8), np.uint32)
        w, _ = voc.transform(v, jnp.asarray(qb), jnp.ones(1, bool))
        assert float(v.word_idf[int(w[0])]) == np.float32(0.4)

    def test_sparse_db_matches_dense(self):
        from weiner_slamit_v2_tpu.bow.database import (
            build_db_from_keyframes,
            build_sparse_db_from_keyframes,
            query_candidates_sparse,
            sparse_bow_row,
        )

        vocab, desc = self._train_small(k=4, L=3)
        rng = np.random.default_rng(3)
        Kf, N = 6, 48
        kf_desc = jnp.stack(
            [desc[rng.choice(desc.shape[0], N, replace=False)] for _ in range(Kf)]
        )
        feat_valid = jnp.asarray(rng.uniform(size=(Kf, N)) > 0.1)
        kf_valid = jnp.ones(Kf, bool).at[4].set(False)
        dense = build_db_from_keyframes(vocab, kf_desc, feat_valid, kf_valid)
        sparse = build_sparse_db_from_keyframes(vocab, kf_desc, feat_valid, kf_valid)

        qw, _ = voc.transform(vocab, kf_desc[0], feat_valid[0])
        vq = voc.bow_vector(vocab, qw)
        q_wid, q_wt = sparse_bow_row(vocab, qw)
        covis = jnp.zeros((Kf, Kf), jnp.float32)
        exclude = jnp.zeros(Kf, bool)
        acc_d, keep_d = query_candidates(
            dense, vq, exclude, covis, jnp.asarray(0.0)
        )
        acc_s, keep_s = query_candidates_sparse(
            sparse, q_wid, q_wt, exclude, covis, jnp.asarray(0.0),
            n_words=vocab.n_words,
        )
        np.testing.assert_allclose(np.asarray(acc_d), np.asarray(acc_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(keep_d), np.asarray(keep_s))

    def test_bowindex_pretrained_path(self, tmp_path):
        """BowIndex.from_pretrained: loads the file, never retrains, and
        produces working relocalization-style candidates."""
        from weiner_slamit_v2_tpu.bow.database import BowIndex

        vocab, desc = self._train_small(k=3, L=2)
        path = str(tmp_path / "voc.txt")
        voc.save_dbow2_text(vocab, path)
        idx = BowIndex.from_pretrained(path, max_kf=8, sparse_slots=48)
        assert idx.ready and idx.pretrained
        rng = np.random.default_rng(5)
        rows = []
        for k in range(4):
            d = desc[rng.choice(desc.shape[0], 48, replace=False)]
            rows.append(d)
            idx.add(k, d, jnp.ones(48, bool))
        # query with keyframe 2's own descriptors: kf 2 must win
        q = idx.query_vector(rows[2], jnp.ones(48, bool))
        covis = jnp.zeros((8, 8), jnp.float32)
        acc, keep = idx.candidates(q, jnp.zeros(8, bool), covis)
        assert int(jnp.argmax(jnp.where(keep, acc, -1.0))) == 2
        # retrain must keep the pretrained vocabulary
        v_before = idx.vocab
        idx.retrain(
            jnp.stack([r for r in rows]),
            jnp.ones((4, 48), bool),
            jnp.ones(4, bool).at[3].set(True)[:4],
            jax.random.PRNGKey(0),
        )
        assert idx.vocab is v_before

    def test_bowindex_sparse_mode_forced(self, tmp_path):
        """A vocabulary above the dense-row budget flips the index to the
        sparse database and candidates still work."""
        from weiner_slamit_v2_tpu.bow.database import (
            BowIndex, SparseKeyframeDatabase,
        )

        vocab, desc = self._train_small(k=8, L=2)  # 64 words
        idx = BowIndex(8, vocab=vocab, sparse_slots=32)
        idx.sparse = True  # force the big-vocab path on a small vocab
        idx.db = SparseKeyframeDatabase.create(8, 32)
        rng = np.random.default_rng(9)
        rows = []
        for k in range(3):
            d = desc[rng.choice(desc.shape[0], 32, replace=False)]
            rows.append(d)
            idx.add(k, d, jnp.ones(32, bool))
        q = idx.query_vector(rows[1], jnp.ones(32, bool))
        acc, keep = idx.candidates(
            q, jnp.zeros(8, bool), jnp.zeros((8, 8), jnp.float32)
        )
        assert int(jnp.argmax(jnp.where(keep, acc, -1.0))) == 1
        # erase + permute keep shapes/validity coherent
        idx.erase(0)
        assert not bool(idx.db.has_entry[0])
        idx.mask_valid(jnp.ones(8, bool).at[2].set(False))
        assert not bool(idx.db.has_entry[2])
