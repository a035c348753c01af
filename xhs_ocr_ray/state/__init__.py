"""Resumable-run state: per-partition checkpoint manifests."""
