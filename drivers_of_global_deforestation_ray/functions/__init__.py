"""Pure vectorized kernels (numpy / pyarrow only — no Ray imports)."""
