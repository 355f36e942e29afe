"""Multi-chip scaling: meshes, shardings, distributed bundle adjustment."""
