"""Shared utilities."""

from .scalers import StandardScaler, MinMaxScaler, save_scaler, load_scaler  # noqa: F401
