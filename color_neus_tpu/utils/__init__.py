"""Experiment runtime utilities: config, registry, logging, metrics, recorder."""
