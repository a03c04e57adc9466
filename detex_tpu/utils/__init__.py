"""Utility subsystems: checkpointing, metrics, profiling."""
