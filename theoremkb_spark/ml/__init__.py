"""Learned sequence models for the labeling stage (M1/M2)."""
