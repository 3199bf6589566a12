"""Engine-level column function helpers (deterministic numerics, vectors, text hashing)."""
