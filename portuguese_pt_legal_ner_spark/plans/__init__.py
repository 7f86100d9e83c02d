"""End-to-end pipeline plans, checkpointing, and resume logic."""
