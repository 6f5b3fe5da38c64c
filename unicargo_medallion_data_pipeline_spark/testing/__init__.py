"""Adversarial test-data generation for robustness sweeps."""
