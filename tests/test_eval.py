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
