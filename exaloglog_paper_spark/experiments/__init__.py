"""Experiment pipelines reproducing the reference's empirical studies."""
