"""Feature normalization scalers.

Reference stage 3 fits sklearn StandardScaler via partial_fit on PPG frames
only ("results degrade if F0 is scaled",
/root/reference/harana/bin/compute_statistics_fastsvc.py:84-90) and dumps
stats.joblib; B02 additionally uses MinMaxScaler for ppg/lf0/lft/spk_emb.
These are small self-contained equivalents (same incremental-moment math as
sklearn's partial_fit) so the framework has no sklearn dependency at run
time; load_scaler also accepts sklearn objects from reference joblib dumps.
"""

from __future__ import annotations

import joblib
import numpy as np


class StandardScaler:
    """Incremental mean/std scaler (sklearn-compatible attributes)."""

    def __init__(self):
        self.n_samples_seen_ = 0
        self.mean_ = None
        self.var_ = None

    @property
    def scale_(self):
        return np.sqrt(self.var_)

    def partial_fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        n = X.shape[0]
        if self.n_samples_seen_ == 0:
            self.mean_ = X.mean(axis=0)
            self.var_ = X.var(axis=0)
            self.n_samples_seen_ = n
            return self
        total = self.n_samples_seen_ + n
        new_mean = X.mean(axis=0)
        new_var = X.var(axis=0)
        delta = new_mean - self.mean_
        m_a = self.var_ * self.n_samples_seen_
        m_b = new_var * n
        m2 = m_a + m_b + delta**2 * self.n_samples_seen_ * n / total
        self.mean_ = self.mean_ + delta * n / total
        self.var_ = m2 / total
        self.n_samples_seen_ = total
        return self

    def transform(self, X):
        return (np.asarray(X) - self.mean_) / self.scale_

    def inverse_transform(self, X):
        return np.asarray(X) * self.scale_ + self.mean_


class MinMaxScaler:
    """Incremental min/max scaler to [0, 1] (sklearn-compatible attributes)."""

    def __init__(self, feature_range=(0.0, 1.0)):
        self.feature_range = feature_range
        self.data_min_ = None
        self.data_max_ = None

    @property
    def scale_(self):
        lo, hi = self.feature_range
        rng = self.data_max_ - self.data_min_
        rng = np.where(rng == 0, 1.0, rng)
        return (hi - lo) / rng

    @property
    def min_(self):
        return self.feature_range[0] - self.data_min_ * self.scale_

    def partial_fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        mn, mx = X.min(axis=0), X.max(axis=0)
        if self.data_min_ is None:
            self.data_min_, self.data_max_ = mn, mx
        else:
            self.data_min_ = np.minimum(self.data_min_, mn)
            self.data_max_ = np.maximum(self.data_max_, mx)
        return self

    def transform(self, X):
        return np.asarray(X) * self.scale_ + self.min_

    def inverse_transform(self, X):
        return (np.asarray(X) - self.min_) / self.scale_


def save_scaler(scaler, path: str):
    joblib.dump(scaler, path)


def load_scaler(path: str):
    return joblib.load(path)
