"""Replay streams, scan assembly, online worker loop, and map export."""
