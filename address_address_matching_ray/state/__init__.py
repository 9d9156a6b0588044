"""Checkpoint / lineage / metrics state."""
