"""Column-level functions: bit-pattern utilities, vector math, text metrics."""
