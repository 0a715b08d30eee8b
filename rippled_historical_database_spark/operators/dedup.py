"""Placeholder -- populated in subsequent milestones."""
