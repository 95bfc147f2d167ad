"""Offline visualisation of saved maps/trajectories."""
