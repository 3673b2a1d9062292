"""Host-side utilities: bit splicing, timing, logging."""
