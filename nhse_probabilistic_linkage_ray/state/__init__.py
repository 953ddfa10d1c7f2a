"""Run state: per-stage checkpoint manifests and small driver-side graph state."""
