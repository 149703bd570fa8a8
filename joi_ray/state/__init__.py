"""Checkpoint / lineage state for resumable validation runs."""
