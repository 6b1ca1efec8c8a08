"""Evaluation metric tests (mirrors reference test_eval.py:146-167 scope)."""

import numpy as np
import pytest

import torchdr_tpu as tdr


class TestSilhouette:
    def test_matches_sklearn(self, toy_blobs):
        X, y = toy_blobs
        from sklearn.metrics import silhouette_score as sk

        ours = tdr.silhouette_score(X, y, metric="euclidean")
        theirs = sk(X, y, metric="euclidean")
        assert abs(ours - theirs) < 1e-3

    def test_samples_shape(self, toy_blobs):
        X, y = toy_blobs
        s = tdr.silhouette_samples(X, y)
        assert np.asarray(s).shape == (X.shape[0],)


class TestKnnLabelAccuracy:
    def test_separated_blobs_high(self, toy_blobs):
        X, y = toy_blobs
        acc = tdr.knn_label_accuracy(X, y, k=10)
        assert acc > 0.9

    def test_random_labels_low(self, toy_blobs):
        X, _ = toy_blobs
        rng = np.random.default_rng(0)
        acc = tdr.knn_label_accuracy(X, rng.integers(0, 4, X.shape[0]), k=10)
        assert acc < 0.5


class TestNeighborhoodPreservation:
    def test_identity_is_one(self, toy_blobs):
        X, _ = toy_blobs
        assert tdr.neighborhood_preservation(X, X, K=10) == pytest.approx(1.0)

    def test_matches_manual(self, toy_blobs):
        X, y = toy_blobs
        Z = tdr.PCA(n_components=2).fit_transform(X)
        score = tdr.neighborhood_preservation(X, Z, K=10)
        assert 0.0 < score <= 1.0

    def test_sampled_identity_is_one(self, toy_blobs):
        X, _ = toy_blobs
        s = tdr.neighborhood_preservation_sampled(X, X, K=10, n_queries=64)
        assert s == pytest.approx(1.0)

    def test_sampled_full_matches_exact(self, toy_blobs):
        """With n_queries = n the sampled variant equals the full metric."""
        X, _ = toy_blobs
        Z = tdr.PCA(n_components=2).fit_transform(X)
        full = tdr.neighborhood_preservation(X, Z, K=10)
        sampled = tdr.neighborhood_preservation_sampled(
            X, Z, K=10, n_queries=X.shape[0]
        )
        assert abs(full - sampled) < 1e-6


class TestKmeansARI:
    def test_blobs_recovered(self, toy_blobs):
        X, y = toy_blobs
        ari, pred = tdr.kmeans_ari(X, y, random_state=0)
        assert ari > 0.9

    def test_ari_perfect(self):
        y = np.repeat(np.arange(3), 10)
        assert tdr.adjusted_rand_index(y, y) == pytest.approx(1.0)

    def test_ari_vs_sklearn(self, toy_blobs):
        X, y = toy_blobs
        rng = np.random.default_rng(0)
        noisy = y.copy()
        noisy[rng.choice(len(y), 30, replace=False)] = rng.integers(0, 4, 30)
        from sklearn.metrics import adjusted_rand_score

        assert tdr.adjusted_rand_index(y, noisy) == pytest.approx(
            adjusted_rand_score(y, noisy), abs=1e-9
        )


class TestSilhouetteDepth:
    """Weighted / metric variants (reference: eval/silhouette.py:21-262)."""

    def test_weighted_uniform_matches_unweighted(self, toy_blobs):
        X, y = toy_blobs
        from torchdr_tpu.eval.silhouette import silhouette_score

        w = np.ones(X.shape[0], np.float32)
        s1 = silhouette_score(X, y)
        s2 = silhouette_score(X, y, weights=w)
        assert abs(s1 - s2) < 1e-5

    def test_sqeuclidean_metric(self, toy_blobs):
        X, y = toy_blobs
        from sklearn.metrics import silhouette_score as sk

        ours = tdr.silhouette_score(X, y, metric="sqeuclidean")
        theirs = sk(X, y, metric="sqeuclidean")
        assert abs(ours - theirs) < 1e-3

    def test_two_points_per_cluster(self):
        X = np.array([[0, 0], [0.1, 0], [5, 5], [5.1, 5]], np.float32)
        y = np.array([0, 0, 1, 1])
        assert tdr.silhouette_score(X, y) > 0.9

    def test_single_cluster_raises(self):
        # sklearn contract: silhouette needs >= 2 labels
        X = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
        y = np.zeros(20, int)
        with pytest.raises(ValueError, match="2 labels"):
            tdr.silhouette_samples(X, y)


class TestPerSampleContracts:
    def test_knn_accuracy_per_sample(self, toy_blobs):
        X, y = toy_blobs
        per = tdr.knn_label_accuracy(X, y, k=5, return_per_sample=True)
        assert per.shape == (X.shape[0],)
        assert float(per.min()) >= 0.0 and float(per.max()) <= 1.0

    def test_preservation_per_sample_mean_matches(self, toy_blobs):
        X, y = toy_blobs
        Z = tdr.PCA(n_components=2).fit_transform(X)
        per = tdr.neighborhood_preservation(X, Z, K=8, return_per_sample=True)
        total = tdr.neighborhood_preservation(X, Z, K=8)
        assert abs(float(np.mean(np.asarray(per))) - total) < 1e-6

    def test_knn_recall_helper(self):
        true = np.array([[1, 2, 3], [4, 5, 6]])
        pred = np.array([[1, 2, 9], [6, 5, 4]])
        assert tdr.knn_recall(pred, true) == pytest.approx((2 / 3 + 1.0) / 2)
