"""Data plane: struct-of-arrays tables and device-side data generators."""
