"""Estimation models: the error-state Kalman filter and VGICP registration."""
