"""Checkpoint manifests for resumable crawl runs."""
